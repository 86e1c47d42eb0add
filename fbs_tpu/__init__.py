"""fbs_tpu — TPU-native forward-backward diffusion bridging.

A ground-up TPU-first rebuild of the capabilities of zgbkdlm/fbs
("Conditioning diffusion models by explicit forward-backward bridging",
arXiv 2405.13794): particle-Gibbs / CSMC / particle pseudo-marginal MCMC
conditional samplers for generative diffusions and Schrodinger bridges,
with JAX/XLA/Pallas compute, GSPMD sharding over TPU meshes, and fused
score-network sampler kernels.
"""

__version__ = "0.1.0"

from fbs_tpu import math  # noqa: E402
from fbs_tpu import sdes  # noqa: E402
from fbs_tpu import samplers  # noqa: E402
from fbs_tpu import dsb  # noqa: E402
from fbs_tpu import metrics  # noqa: E402
from fbs_tpu import profiling  # noqa: E402
