from .grids import (BLUE, CHAR_TENSORS, RED, add_border, images_to_grid,
                    save_image, save_images_as_grid)
from .sampling import (create_images, create_images_from_noise,
                       sort_images_by_prediction, to_batch, to_image_tensor)
