from fbs_tpu.nn.base import make_st_nn, sinusoidal_embedding
from fbs_tpu.nn.utils import make_optax_kernel, make_nn_with_time
from fbs_tpu.nn.unet import UNet, PixelShuffle, default_compute_dtype, standardize_ws_kernels
from fbs_tpu.nn.models import (CrescentMLP, GMSBMLP, STMLP, MNISTAutoEncoder,
                               MNISTConvNet, make_simple_st_nn)
