#!/usr/bin/env python
"""Trainer base: progress reporting, scheduling, checkpointing, early stop.

Parity surface: /root/reference/aps/trainer/base.py (ProgressReporter:85,
ErrorDetector:263, StopDetector:303, Trainer:375 with run/run_in_epoch/
run_in_batch/save_checkpoint/load_checkpoint, WeightNoiseAdder:30,
ParameterAverager:55).

TPU redesign: one process drives the whole mesh (SPMD); the compiled train
step lives in the DataParallelTrainer subclass (aps_tpu/trainer/dp.py).
Checkpoints are pickled numpy pytrees {params, opt_state, schedulers, ...};
`train.yaml` beside them remains the source of truth for model rebuild."""

import math
import pickle
import warnings
from collections import defaultdict
from pathlib import Path
from typing import Dict, List, Optional, Tuple, Union

import jax
import numpy as np

from aps_tpu.task.base import Task
from aps_tpu.trainer.lr import LrScheduler
from aps_tpu.trainer.ss import SsScheduler
from aps_tpu.utils import SimpleTimer, get_logger


class ParameterAverager(object):
    """Average parameter pytrees across checkpoints."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.count = 0
        self.averaged = None

    def add(self, params):
        params = jax.tree_util.tree_map(np.asarray, params)
        if self.averaged is None:
            self.averaged = jax.tree_util.tree_map(np.copy, params)
        else:
            self.averaged = jax.tree_util.tree_map(np.add, self.averaged,
                                                   params)
        self.count += 1

    def state_dict(self):
        return jax.tree_util.tree_map(
            lambda x: (x / self.count).astype(x.dtype), self.averaged)


class ProgressReporter(object):
    """Track training stats with weighted reduction (#utt/#tok/none).

    Values may be device scalars; they are synced lazily (every `period`
    batches and at report time) so the step pipeline is not stalled."""

    def __init__(self,
                 checkpoint: Path,
                 metrics: List[str],
                 rank: Optional[int] = None,
                 period: int = 100,
                 tensorboard: bool = False,
                 reduction_tag: str = "none") -> None:
        self.rank = rank
        self.period = period
        self.reduction_tag = reduction_tag
        checkpoint.mkdir(parents=True, exist_ok=True)
        if rank is None:
            logger_loc = (checkpoint / "trainer.log").as_posix()
            self.header = "Trainer"
        else:
            logger_loc = (checkpoint / f"trainer.rank.{rank}.log").as_posix()
            self.header = f"Rank {rank}"
        self.logger = get_logger(logger_loc, file=True)
        self.board_writer = None
        if tensorboard and rank in [0, None]:
            try:
                from torch.utils.tensorboard import SummaryWriter
                self.board_writer = SummaryWriter(checkpoint)
            except ImportError:
                warnings.warn("tensorboard not installed, disabling it...")
        self.metrics = metrics
        self.mode = "train"
        self.reset()

    def log(self, sstr: str) -> None:
        self.logger.info(f"{self.header} - {sstr}")

    def eval(self) -> None:
        self.log(">> Set eval mode ...")
        self.mode = "valid"
        self.reset()

    def train(self) -> None:
        self.log(">> Set train mode ...")
        self.mode = "train"
        self.reset()

    def reset(self) -> None:
        self.stats = defaultdict(list)
        self.timer = SimpleTimer()

    def update(self, dict_obj: Dict, keys: Optional[List[str]] = None):
        if dict_obj is None:
            return
        for key, value in dict_obj.items():
            if keys is None or key in keys:
                self.add(key, value)

    def add(self, key: str, value) -> None:
        self.stats[key].append(value)
        N = len(self.stats[key])
        if not N % self.period:
            if key == "rate":
                cur = float(self.stats[key][-1])
                self.log(f"Processed {N:.2e} batches ({key} = {cur:.3e}) ...")
            elif key[0] == "#":
                cur = int(
                    sum(float(v) for v in self.stats[key][-self.period:]) //
                    self.period)
                self.log(f"Processed {N:.2e} batches ({key} = {cur:d}) ...")
            else:
                avg = self._report_metric(key, period=self.period)
                self.log(f"Processed {N:.2e} batches ({key} = {avg:+.2f}) ...")

    def _values(self, key: str, period: int = 0) -> List[float]:
        vals = [float(v) for v in self.stats[key][-period:]]
        return [v if math.isfinite(v) else 0.0 for v in vals]

    def _report_metric(self, key: str, period: int = 0) -> float:
        nors = self._values(key, period)
        if self.reduction_tag in self.stats:
            dens = self._values(self.reduction_tag, period)
            avg = sum(n * d for n, d in zip(nors, dens)) / sum(dens)
        else:
            avg = sum(nors) / len(nors)
        if key == "accu":
            avg *= 100
        if key == "@ppl":
            avg = math.exp(avg)
        return avg

    def report(self, epoch: int, lr: float):
        N = len(self.stats["loss"])
        if self.mode == "valid":
            sstr = ",".join(f"{v:.2f}" for v in self._values("loss"))
            self.log(f"Loss on {N:d} batches: {sstr}")
        if N == 0:
            raise RuntimeError("No statistics to report")
        reports = {m: self._report_metric(m) for m in self.metrics}
        if self.board_writer:
            for name, value in reports.items():
                self.board_writer.add_scalar(f"{self.mode}/{name}", value,
                                             epoch)
        cost = self.timer.elapsed()
        header = "/".join(self.metrics)
        values = "/".join(f"{reports[m]:.4f}" for m in self.metrics)
        logstr = (f"Epoch {epoch:02d}/{self.mode}: {header}(time/#batch, "
                  f"lr={lr:.3e}) = {values}({cost:.2f}m/{N:d})")
        return reports, logstr


class ErrorDetector(object):
    """Circuit breaker for the train loop: trips once `stop_on_errors`
    consecutive steps fail (a success closes the breaker again)."""

    def __init__(self, stop_on_errors: int) -> None:
        self.stop_on_errors = stop_on_errors
        self.reset()

    def reset(self) -> None:
        self.counter = 0

    def stop(self) -> bool:
        return self.counter >= self.stop_on_errors

    def step(self, succ: bool) -> bool:
        self.counter = 0 if succ else self.counter + 1
        return self.stop()


class StopDetector(object):
    """Early stopping: stop once the tracked dev metric has gone `no_impr`
    evaluations without beating the best-so-far by more than
    `no_impr_thres`. Internally tracks `sign * value` so "min" (losses)
    and "max" (accuracies) share one comparison."""

    def __init__(self,
                 no_impr: int,
                 mode: str = "min",
                 init_criterion: float = math.inf,
                 no_impr_thres: float = 2e-3) -> None:
        assert mode in ("min", "max")
        self.max_no_impr = no_impr
        self.no_impr = 0
        self.no_impr_thres = no_impr_thres
        self.sign = 1.0 if mode == "min" else -1.0
        self.best_criterion = self.sign * init_criterion

    def reset(self, update_value: float) -> None:
        self.best_criterion = self.sign * update_value

    def stop(self) -> bool:
        return self.no_impr >= self.max_no_impr

    @property
    def best(self) -> float:
        return self.sign * self.best_criterion

    def state_dict(self) -> Dict:
        return dict(self.__dict__)

    def load_state_dict(self, state_dict: Dict) -> None:
        state_dict = dict(state_dict)
        if "mode" in state_dict:
            # legacy checkpoints stored mode + an unsigned best_criterion;
            # convert to the signed representation so mode="max" resumes
            # keep tracking improvements correctly
            sign = 1.0 if state_dict.pop("mode") == "min" else -1.0
            state_dict["sign"] = sign
            if "best_criterion" in state_dict:
                state_dict["best_criterion"] = \
                    sign * state_dict["best_criterion"]
        self.__dict__.update(state_dict)

    def step(self, update_value: float) -> bool:
        signed = self.sign * update_value
        if signed + self.no_impr_thres < self.best_criterion:
            self.best_criterion = signed
            self.no_impr = 0
            return True
        self.no_impr += 1
        return False


class Trainer(object):
    """Base trainer: owns schedulers, reporter, detectors, checkpoint IO and
    the epoch/step loops; the compiled math lives in subclasses
    (init_state / train_one_step / valid_one_step)."""

    def __init__(self,
                 task: Task,
                 checkpoint: Union[str, Path] = "cpt",
                 optimizer: str = "adam",
                 optimizer_kwargs: Optional[Dict] = None,
                 lr_scheduler: str = "reduce_lr",
                 lr_scheduler_kwargs: Optional[Dict] = None,
                 lr_scheduler_period: str = "epoch",
                 ss_scheduler: str = "const",
                 ss_scheduler_kwargs: Optional[Dict] = None,
                 clip_gradient: Optional[float] = None,
                 acmu_gradient: int = 1,
                 weight_noise_cfg: List[int] = [0, 1, -1],
                 weight_noise_std: Optional[float] = None,
                 prog_interval: int = 100,
                 save_interval: int = -1,
                 resume: str = "",
                 init: str = "",
                 tensorboard: bool = False,
                 stop_criterion: str = "loss",
                 no_impr: int = 6,
                 no_impr_thres: float = 1e-3,
                 average_checkpoint: int = 0,
                 report_metrics: List[str] = ["loss"],
                 reduction_tag: str = "none",
                 stop_on_errors: int = 32,
                 seed: int = 777,
                 matmul_precision: str = "float32",
                 profile: str = "",
                 profile_steps: Tuple[int, int] = (10, 15),
                 **kwargs) -> None:
        if lr_scheduler_period not in ["epoch", "step"]:
            raise ValueError(
                f"Unsupported lr_scheduler_period: {lr_scheduler_period}")
        if stop_criterion not in report_metrics:
            raise ValueError("stop_criterion not in report_metrics: "
                             f"{stop_criterion}")
        self.task = task
        self.checkpoint = Path(checkpoint)
        self.is_chief = jax.process_index() == 0
        # auto-resume
        last_checkpoint = self.checkpoint / "last.ckpt"
        if last_checkpoint.exists():
            resume = last_checkpoint.as_posix()

        # per-rank log files in multi-process runs (reference parity:
        # /root/reference/aps/trainer/base.py:85-130 writes
        # trainer.rank.N.log per process): with a SHARED checkpoint dir
        # on multi-host, a rank-less name would have every process append
        # to the same trainer.log
        rank = jax.process_index() if jax.process_count() > 1 else None
        self.reporter = ProgressReporter(self.checkpoint,
                                         report_metrics,
                                         rank=rank,
                                         period=prog_interval,
                                         tensorboard=tensorboard,
                                         reduction_tag=reduction_tag)
        self.clip_gradient = clip_gradient
        self.acmu_gradient = acmu_gradient
        self.weight_noise_cfg = weight_noise_cfg
        self.weight_noise_std = weight_noise_std
        self.cur_epoch = 0
        self.cur_step = 0
        self.ssr = 0
        self.no_impr = no_impr
        self.average_checkpoint = average_checkpoint
        self.save_interval = 1 if average_checkpoint > 1 else save_interval
        self.seed = int(seed)
        # "bfloat16" runs MXU matmuls in bf16 with f32 accumulation:
        # ~6x faster training steps on v5e at negligible loss deviation
        if matmul_precision not in ("float32", "bfloat16", "tensorfloat32",
                                    "highest", "default"):
            raise ValueError(
                f"Unsupported matmul_precision: {matmul_precision}")
        self.matmul_precision = matmul_precision
        # native profiling: capture an xplane trace of steps
        # [profile_steps) into `profile` (view with tensorboard/xprof)
        self.profile_dir = profile
        self.profile_steps = tuple(profile_steps)
        self._profiling = False

        mode = "max" if stop_criterion == "accu" else "min"
        self.stop_on = stop_criterion
        self.stop_detector = StopDetector(no_impr, mode=mode,
                                          no_impr_thres=no_impr_thres)
        self.detector = ErrorDetector(stop_on_errors)

        # optimizer config kept for subclasses building the optax chain
        self.optimizer_name = optimizer
        self.optimizer_kwargs = dict(optimizer_kwargs or {})

        # lr scheduler
        lr0 = self.optimizer_kwargs.get("lr", 1e-3)
        _lr_kwargs = dict(lr_scheduler_kwargs or {})
        _lr_kwargs.pop("state", None)
        if lr_scheduler == "reduce_lr":
            if lr_scheduler_period != "epoch":
                warnings.warn("reduce_lr implies lr_scheduler_period=epoch")
                lr_scheduler_period = "epoch"
            _lr_kwargs.update({
                "mode": mode,
                "threshold_mode": "abs",
                "threshold": no_impr_thres
            })
        if lr_scheduler not in LrScheduler:
            raise ValueError(f"Unsupported lr scheduler: {lr_scheduler}")
        self.lr_scheduler = LrScheduler[lr_scheduler](lr=lr0, **_lr_kwargs)
        self.lr_scheduler_period = lr_scheduler_period

        # ss scheduler
        if ss_scheduler_kwargs:
            if ss_scheduler not in SsScheduler:
                raise ValueError(f"Unsupported ss scheduler: {ss_scheduler}")
            if "accu" not in report_metrics:
                raise ValueError("schedule sampling requires tracking accu")
            self.ss_scheduler = SsScheduler[ss_scheduler](
                **ss_scheduler_kwargs)
            self.reporter.log(f"Using schedule sampling: {ss_scheduler}")
        else:
            self.ss_scheduler = None

        # resume/init checkpoints (applied by subclass after param init)
        self.cpt_stats = None
        self.init_mode = ""
        if resume:
            self.cpt_stats = self.load_checkpoint_file(resume)
            self.init_mode = "resume"
            self.cur_epoch = self.cpt_stats["epoch"]
            self.cur_step = self.cpt_stats.get("step", 0)
            if "lr_scheduler_state" in self.cpt_stats:
                self.lr_scheduler.load_state_dict(
                    self.cpt_stats["lr_scheduler_state"])
            if "stop_state" in self.cpt_stats:
                self.stop_detector.load_state_dict(
                    self.cpt_stats["stop_state"])
            self.reporter.log(
                f"Resume from checkpoint {resume}: epoch {self.cur_epoch}")
        elif init:
            self.cpt_stats = self.load_checkpoint_file(init)
            self.init_mode = "init"
            self.reporter.log(f"Initialize model from checkpoint {init}")

        if clip_gradient:
            self.reporter.log(
                f"Clip gradient if over {clip_gradient} L2 norm")
        if acmu_gradient > 1:
            self.reporter.log(
                f"Accumulate gradient per {acmu_gradient} batches")

    # ------------------------------------------------------------------
    # checkpoint IO
    # ------------------------------------------------------------------
    @staticmethod
    def load_checkpoint_file(path: str) -> Dict:
        with open(path, "rb") as fd:
            return pickle.load(fd)

    def checkpoint_states(self, epoch: int) -> Dict:
        """Collect states to store (subclass adds params/opt_state)."""
        return {
            "epoch": epoch,
            "step": self.cur_step,
            "lr_scheduler_state": self.lr_scheduler.state_dict(),
            "stop_state": self.stop_detector.state_dict(),
        }

    def save_checkpoint(self, epoch: int, best: bool = True) -> None:
        if not self.is_chief:
            return
        stats = self.checkpoint_states(epoch)
        # serialize once, write bytes per tag (last/best/epoch.N share the
        # identical payload — no reason to pickle a ~100 MB tree 3x)
        blob = pickle.dumps(stats)
        (self.checkpoint / "last.ckpt").write_bytes(blob)
        if best:
            (self.checkpoint / "best.ckpt").write_bytes(blob)
            self.reporter.log(f"Save the best checkpoint: epoch {epoch}")
        if self.save_interval > 0 and epoch % self.save_interval == 0:
            (self.checkpoint / f"epoch.{epoch}.ckpt").write_bytes(blob)

    # ------------------------------------------------------------------
    # abstract hooks
    # ------------------------------------------------------------------
    def init_state(self, egs: Dict) -> None:
        """Initialize parameters/optimizer from one example batch."""
        raise NotImplementedError

    def train_one_step(self, egs: Dict):
        """Dispatch one step; returns a list of completed-step results
        (see DataParallelTrainer.train_one_step)."""
        raise NotImplementedError

    def valid_one_step(self, egs: Dict) -> None:
        raise NotImplementedError

    # ------------------------------------------------------------------
    # epoch loops
    # ------------------------------------------------------------------
    def prep_egs(self, egs: Dict) -> Dict:
        return egs

    def drain(self):
        """Block on any in-flight pipelined train steps (overridden by
        trainers that keep steps in flight); returns the list of drained
        step results — empty when nothing was in flight."""
        return []

    def _breaker(self, results) -> None:
        """Feed completed-step results to the consecutive-error circuit
        breaker, one detector event per step."""
        for succ in results:
            if self.detector.step(succ):
                raise RuntimeError(
                    f"Stop training: detected {self.detector.counter} "
                    "consecutive errors")

    def valid_epoch(self, data_loader) -> None:
        self.reporter.eval()
        for egs in data_loader:
            self.valid_one_step(self.prep_egs(egs))

    def _profile_tick(self) -> None:
        if not self.profile_dir:
            return
        import jax.profiler
        beg, end = self.profile_steps
        if not self._profiling and self.cur_step == beg:
            jax.profiler.start_trace(self.profile_dir)
            self._profiling = True
            self.reporter.log(f"Profiler: tracing steps [{beg}, {end}) "
                              f"into {self.profile_dir}")
        elif self._profiling and self.cur_step >= end:
            jax.profiler.stop_trace()
            self._profiling = False
            self.reporter.log(f"Profiler: trace saved to "
                              f"{self.profile_dir}")

    def train_epoch(self, data_loader) -> None:
        self.reporter.train()
        for egs in data_loader:
            self._profile_tick()
            self._breaker(self.train_one_step(self.prep_egs(egs)))
            self.cur_step += 1
            if self.lr_scheduler_period == "step":
                self.lr_scheduler.step()
        # sync in-flight pipelined steps so epoch stats are complete and
        # trailing failures still reach the circuit breaker
        self._breaker(self.drain())

    def _schedule_end_of_eval(self, update_value: float,
                              reports: Dict) -> bool:
        """Common post-validation scheduling; returns better-or-not."""
        better = self.stop_detector.step(update_value)
        if self.lr_scheduler_period == "epoch" or \
                isinstance(self.lr_scheduler, LrScheduler["reduce_lr"]):
            self.lr_scheduler.step(update_value)
        if self.ss_scheduler:
            self.ssr = self.ss_scheduler.step(self.cur_epoch,
                                              reports.get("accu", 0))
        return better

    def run(self,
            trn_loader,
            dev_loader,
            num_epochs: int = 50,
            eval_interval: int = -1) -> None:
        timer = SimpleTimer()
        # lazily initialize parameters from the first batch
        trn_loader.set_epoch(self.cur_epoch)
        first_egs = next(iter(trn_loader))
        self.init_state(self.prep_egs(first_egs))

        # initial validation pass
        self.valid_epoch(dev_loader)
        reports, logstr = self.reporter.report(self.cur_epoch, 0)
        self.reporter.log(logstr)
        if self.init_mode != "resume":
            self.stop_detector.reset(reports[self.stop_on])
        self.init_value = reports[self.stop_on]

        if eval_interval > 0:
            self._run_in_batch(trn_loader, dev_loader, num_epochs,
                               eval_interval)
        else:
            self._run_in_epoch(trn_loader, dev_loader, num_epochs)
        self.reporter.log(
            f"Training for {self.cur_epoch:d}/{num_epochs:d} epochs done "
            f"(best = {self.stop_detector.best:.4f}, "
            f"{timer.elapsed():.2f}m)")

    def _eval_and_schedule(self, dev_loader) -> bool:
        self.valid_epoch(dev_loader)
        lr = self.lr_scheduler.get_lr()
        reports, logstr = self.reporter.report(self.cur_epoch, lr)
        update_value = reports[self.stop_on]
        better = self._schedule_end_of_eval(update_value, reports)
        if better:
            logstr += " | best"
        else:
            logstr += f" | no impr {self.stop_detector.no_impr:d}, " \
                      f"best = {self.stop_detector.best:.4f}"
        self.reporter.log(logstr)
        self.save_checkpoint(self.cur_epoch, best=better)
        return better

    def _run_in_epoch(self, trn_loader, dev_loader, num_epochs: int) -> None:
        while self.cur_epoch < num_epochs:
            trn_loader.set_epoch(self.cur_epoch)
            self.cur_epoch += 1
            self.train_epoch(trn_loader)
            _, logstr = self.reporter.report(self.cur_epoch,
                                             self.lr_scheduler.get_lr())
            self.reporter.log(logstr)
            self._eval_and_schedule(dev_loader)
            if self.stop_detector.stop():
                self.reporter.log("Stop training cause no impr for "
                                  f"{self.stop_detector.no_impr:d} epochs")
                break
            self.reporter.train()

    def _run_in_batch(self, trn_loader, dev_loader, num_epochs: int,
                      eval_interval: int) -> None:
        """For large datasets: validate every eval_interval steps."""
        stop = False
        while not stop and self.cur_epoch < num_epochs:
            trn_loader.set_epoch(self.cur_epoch)
            self.cur_epoch += 1
            self.reporter.train()
            for egs in trn_loader:
                self._profile_tick()
                self._breaker(self.train_one_step(self.prep_egs(egs)))
                self.cur_step += 1
                if self.lr_scheduler_period == "step":
                    self.lr_scheduler.step()
                if self.cur_step % eval_interval == 0:
                    self._breaker(self.drain())
                    _, logstr = self.reporter.report(
                        self.cur_epoch, self.lr_scheduler.get_lr())
                    self.reporter.log(logstr)
                    self._eval_and_schedule(dev_loader)
                    if self.stop_detector.stop():
                        stop = True
                        break
                    self.reporter.train()
            self._breaker(self.drain())
