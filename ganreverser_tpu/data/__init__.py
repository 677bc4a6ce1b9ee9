from .dataset import Dataset, normalize_images, scan_image_paths
from .colorspace import (COLOR_SPACES, hsl2rgb, rgb2hsl, rgb2y, rgb2yuv,
                         rgb_to_colorspace, switch_colorspace, to_rgb,
                         yuv2rgb)
from .synthetic import synthetic_faces
from .prefetch import prefetch_to_device
