from .imageops import (assemble_grid, available, normalize_pm1_inplace,
                       resize_bilinear_batch, rgb2y_native, rgb2yuv_native,
                       yuv2rgb_native)
