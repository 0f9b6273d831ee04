from .letterbox import (
    padding,
    padding_fixation,
    resize_fixation,
    resize_img,
    resize_pts,
    normalize_frames,
    postprocess_prediction,
    postprocess_visvid,
    im2uint8,
    IMAGENET_MEAN,
    IMAGENET_STD,
)
from .matio import loadmat, savemat
from .priors import (
    gaussian_priors,
    dy_gaussian_priors,
    get_gauss_priors,
    get_ob_priors,
    make_mean_maps,
)
from .lists import read_video_list, shuffle_data_dir, shuffle_data_list, get_video_list
from .video import decode_video, save_video, preprocess_videos, preprocess_vidmaps, preprocess_vidfixs
from .images import load_salicon_example, salicon_batches, salicon_file_lists
from .loaders import read_traindata_list, test_dataset, traindata_dataset, video_dataset
