#!/usr/bin/env python
"""Small shared utilities: logging, timing, seeding, device helpers.

Parity surface: /root/reference/aps/utils.py (get_logger:22, load_obj:52,
get_device_ids:71, set_seed:93, SimpleTimer:111) re-thought for JAX: device
placement is one `jax.device_put` of a host pytree, and seeding returns a
`jax.random.PRNGKey` instead of mutating global RNG state.
"""

import logging
import random
import sys
import time
from typing import Optional

import jax
import numpy as np

LOG_FORMAT = "%(asctime)s [%(pathname)s:%(lineno)s - %(levelname)s ] %(message)s"


def get_logger(name: str,
               format_str: str = LOG_FORMAT,
               date_format: str = "%Y-%m-%d %H:%M:%S",
               file: bool = False) -> logging.Logger:
    """Get a python logger (google-style format, stderr or file)."""
    logger = logging.getLogger(name)
    if logger.handlers:
        return logger
    logger.setLevel(logging.INFO)
    formatter = logging.Formatter(fmt=format_str, datefmt=date_format)
    if file:
        handler = logging.FileHandler(name)
    else:
        handler = logging.StreamHandler(sys.stderr)
    handler.setFormatter(formatter)
    logger.addHandler(handler)
    logger.propagate = False
    return logger


def load_obj(obj, device=None, sharding=None):
    """Recursively move a host pytree (numpy arrays / lists / dicts) onto
    device(s). `sharding` (a jax.sharding.Sharding) wins over `device`."""

    def _load(x):
        if isinstance(x, (np.ndarray, jax.Array)):
            if sharding is not None:
                return jax.device_put(x, sharding)
            if device is not None:
                return jax.device_put(x, device)
            return jax.device_put(x)
        return x

    return jax.tree_util.tree_map(_load, obj)


def get_device_ids(device_ids=None):
    """Resolve the device list: None/'' => all local devices; 'i,j' => subset."""
    devices = jax.local_devices()
    if device_ids in (None, "", -1):
        return devices
    if isinstance(device_ids, int):
        return [devices[device_ids]]
    if isinstance(device_ids, str):
        ids = [int(t) for t in device_ids.split(",") if t != ""]
        return [devices[i] for i in ids]
    return [devices[i] for i in device_ids]


def set_seed(seed_str: str) -> Optional[jax.Array]:
    """Seed python/numpy RNGs and return a PRNGKey (None if seed < 0)."""
    seed = int(seed_str)
    if seed < 0:
        return None
    random.seed(seed)
    np.random.seed(seed)
    return jax.random.PRNGKey(seed)


class SimpleTimer(object):
    """Wall-clock timer reporting elapsed minutes."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.start = time.time()

    def elapsed(self) -> float:
        return (time.time() - self.start) / 60.0


def block_until_ready(tree):
    """Barrier on a pytree of jax arrays (used by timers/benchmarks)."""
    return jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if isinstance(x, jax.Array) else x, tree)


def enable_compilation_cache(cache_dir: Optional[str] = None) -> None:
    """Turn on jax's persistent compilation cache so repeated CLI runs skip
    the (minutes-long for big beam-search programs) XLA compile. Directory:
    explicit arg > $APS_COMPILE_CACHE > ~/.cache/aps_tpu/xla. No-op if the
    running jax doesn't support it."""
    import os
    path = cache_dir or os.environ.get(
        "APS_COMPILE_CACHE",
        os.path.join(os.path.expanduser("~"), ".cache", "aps_tpu", "xla"))
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except Exception as e:  # unsupported backend/config name
        get_logger(__name__).warning(f"compilation cache disabled: {e}")
