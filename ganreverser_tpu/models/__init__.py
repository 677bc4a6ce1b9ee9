from .modules import (Activation, AvgPool, BatchNorm, Conv, ConcatBranches,
                      Dense, Dropout, Flatten, Identity, MaxPool, Module,
                      PReLU, Reshape, Residual, Sequential, SpatialDropout,
                      UpsampleNearest, count_parameters,
                      count_weight_parameters)
from .init import scheme_std, init_dense, init_conv
from .zoo import (create_G, create_G3, create_G4, create_G_encoder, create_D,
                  create_D2, create_D_default, create_D_facegen, create_R,
                  create_R_default, create_residual)
