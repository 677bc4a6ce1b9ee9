from .grids import (BLUE, CHAR_TENSORS, RED, add_border, images_to_grid,
                    save_image, save_images_as_grid)
