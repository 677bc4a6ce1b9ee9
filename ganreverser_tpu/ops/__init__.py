from .upsample_conv import upsample2_conv3x3, upsample2_conv3x3_reference
from .topk_kernel import cosine_scores_pallas, cosine_topk_pallas
from .kmeans_kernel import kmeans_pallas, kmeans_step_pallas
from .conv_kernel import conv3x3_bn_act, fold_batchnorm
from .upsample_conv_kernel import phase_kernels, upsample2_conv3x3_bn_act
from .conv_block_kernel import conv_block
from .tiled_topk import pixel_cosine_topk_tiled, tiled_topk
