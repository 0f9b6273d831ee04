from .infer import test_videos, load_model_for_inference
