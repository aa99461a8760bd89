#!/usr/bin/env python
"""Framework-wide constants.

Parity surface: /root/reference/aps/const.py:13-24 (same names, same semantics) —
re-derived for the JAX build (float32 limits come from numpy, not torch).
"""

import numpy as np

IGNORE_ID = -1
UNK_TOKEN = "<unk>"
BLK_TOKEN = "<b>"
SOS_TOKEN = "<sos>"
EOS_TOKEN = "<eos>"

MAX_INT16 = np.iinfo(np.int16).max
MIN_F32 = np.finfo(np.float32).min
MAX_F32 = np.finfo(np.float32).max
EPSILON = float(np.finfo(np.float32).eps)
NEG_INF = -1.0e30  # mask value that survives bf16 downcast without becoming nan
# the torch build keyed OOM skips off this string; XLA raises RESOURCE_EXHAUSTED
OOM_STRING = "RESOURCE_EXHAUSTED"
