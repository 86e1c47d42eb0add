from fbs_tpu.sdes.linear import (
    LinearSDE,
    StationaryConstLinearSDE,
    StationaryLinLinearSDE,
    StationaryExpLinearSDE,
    make_linear_sde,
    make_ou_sde,
    make_linear_sde_law_loss,
    make_ou_score_matching_loss,
    make_gaussian_bw_sb,
)
from fbs_tpu.sdes.simulators import (
    heun,
    euler_maruyama,
    reverse_simulator,
    discrete_time_simulator,
    doob_bridge_simulator,
)
