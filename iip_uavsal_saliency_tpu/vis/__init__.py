from .overlay import heatmap_overlay, visual_img, visual_vid, visual_vid_frames
