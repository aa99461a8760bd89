#!/usr/bin/env python
"""Schedule-sampling schedulers (parity: /root/reference/aps/trainer/ss.py:
const/epoch/trigger/linear)."""

from typing import List

from aps_tpu.libs import Register

SsScheduler = Register("ss_scheduler")


class BaseScheduler(object):

    def __init__(self, ssr: float) -> None:
        self.ssr = ssr

    def step(self, epoch: int, accu: float) -> float:
        raise NotImplementedError


@SsScheduler.register("const")
class ConstScheduler(BaseScheduler):

    def __init__(self, ssr: float = 0) -> None:
        super(ConstScheduler, self).__init__(ssr)

    def step(self, epoch: int, accu: float) -> float:
        return self.ssr


@SsScheduler.register("epoch")
class EpochScheduler(BaseScheduler):
    """Constant ssr inside an epoch window."""

    def __init__(self, ssr: float = 0, epochs: List[int] = [10, 20]) -> None:
        super(EpochScheduler, self).__init__(ssr)
        self.beg, self.end = epochs

    def step(self, epoch: int, accu: float) -> float:
        return self.ssr if self.beg <= epoch <= self.end else 0


@SsScheduler.register("trigger")
class TriggerScheduler(BaseScheduler):
    """Enable ssr once accuracy exceeds a trigger."""

    def __init__(self, ssr: float = 0, trigger: float = 0.6) -> None:
        super(TriggerScheduler, self).__init__(ssr)
        self.trigger = trigger

    def step(self, epoch: int, accu: float) -> float:
        return 0 if accu < self.trigger else self.ssr


@SsScheduler.register("linear")
class LinearScheduler(BaseScheduler):
    """Linearly ramp ssr over an epoch window."""

    def __init__(self,
                 ssr: float = 0,
                 epochs: List[int] = [10, 20],
                 update_interval: int = 1) -> None:
        super(LinearScheduler, self).__init__(ssr)
        self.beg, self.end = epochs
        self.inc = ssr * update_interval / (self.end - self.beg)
        self.interval = update_interval

    def step(self, epoch: int, accu: float) -> float:
        if epoch < self.beg:
            return 0
        if epoch >= self.end:
            return self.ssr
        inv = (epoch - self.beg) // self.interval + 1
        return inv * self.inc
