from fbs_tpu.samplers.csmc.csmc import (
    csmc_kernel,
    forward_pass,
    forward_pass_terminal,
    backward_sampling_pass,
    backward_scanning_pass,
)
