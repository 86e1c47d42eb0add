"""Type aliases shared across fbs_tpu.

Functional parity with the reference's ``fbs/typings.py`` (reference
``fbs/typings.py:1-22``), kept minimal: every alias is ``jax.Array`` and is
distinguished semantically only.
"""
from __future__ import annotations

from typing import Union

import jax
import numpy as np

JArray = jax.Array
JInt = jax.Array
JFloat = jax.Array
JBool = jax.Array
JKey = jax.Array

Array = Union[jax.Array, np.ndarray]

FloatScalar = Union[float, JFloat]
IntScalar = Union[int, JInt]
BoolScalar = Union[bool, JBool]
