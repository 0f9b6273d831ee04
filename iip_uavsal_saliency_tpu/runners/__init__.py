from .export import ExportedServing, export_serving, run_exported, save_exported
from .infer import test_videos, load_model_for_inference
from .infer_images import test_images
from .latency import latency_summary, measure_dispatch_latency
