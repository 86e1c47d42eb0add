"""Shared sampler state containers (reference ``fbs/samplers/common.py``)."""
from __future__ import annotations

from typing import NamedTuple

from fbs_tpu.typing import JArray, JBool, JFloat


class MCMCState(NamedTuple):
    acceptance_prob: JFloat
    is_accepted: JBool
    prop_log_ell: JFloat
    log_ell: JFloat
