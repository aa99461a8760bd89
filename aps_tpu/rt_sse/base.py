#!/usr/bin/env python
"""Real-time SSE base (parity: /root/reference/aps/rt_sse/base.py,
RealTimeSSEBase:13). `step` carries explicit state instead of buffers."""

from aps_tpu.sse.base import SSEBase


class RealTimeSSEBase(SSEBase):
    """Base class for real-time enhancement/separation models."""

    def step(self, chunk, state=None):
        raise NotImplementedError
