from fbs_tpu.samplers.resampling import systematic, stratified, multinomial, killing
from fbs_tpu.samplers.smc import (
    bootstrap_filter,
    bootstrap_backward_smoother,
    pmcmc_filter_step,
    pcn_proposal,
    pmcmc_kernel,
    twisted_smc,
)
from fbs_tpu.samplers.gibbs import gibbs_init, gibbs_kernel, force_move
from fbs_tpu.samplers.kernels import make_separable_kernels
from fbs_tpu.samplers.common import MCMCState
from fbs_tpu.samplers.csmc import (
    csmc_kernel,
    forward_pass,
    forward_pass_terminal,
    backward_sampling_pass,
    backward_scanning_pass,
)
