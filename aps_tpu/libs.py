#!/usr/bin/env python
"""Registry & assembly layer.

Parity surface: /root/reference/aps/libs.py (Register:17, ApsRegisters:55,
ApsModules:68, dynamic_importlib:95, factory fns:109-199, start_trainer:202-279).

Design: identical decorator-registry + lazy-import contract (registration
happens when a submodule list is imported on first factory call), but
`start_trainer` assembles a JAX mesh-based trainer: there is ONE process that
owns all local TPU devices (SPMD via jax.sharding), so the reference's
process-per-GPU + per-rank batch splitting becomes a per-device sharding of the
global batch inside the trainer.
"""

import importlib
import importlib.util
import os
import sys
from typing import Any, Dict, Iterable, Optional

from aps_tpu.utils import get_logger

logger = get_logger(__name__)


class Register(dict):
    """A name -> class dict populated by decoration:

        my_registry = Register("loader")

        @my_registry.register("am@raw")
        class Loader: ...
    """

    def __init__(self, name: str):
        super(Register, self).__init__()
        self.name = name

    def register(self, alias: str):

    # yapf: disable
        def add(alias, obj):
            if alias in self.keys():
                logger.warning(f"{alias} has already been registered in {self.name}")
            self[alias] = obj
            return obj
    # yapf: enable

        return lambda obj: add(alias, obj)

    def keys_str(self) -> str:
        return ", ".join(sorted(self.keys()))


class ApsRegisters(object):
    """All framework registries."""
    asr = Register("asr")
    sse = Register("sse")
    task = Register("task")
    loader = Register("loader")
    trainer = Register("trainer")
    transform = Register("transform")
    tokenizer = Register("tokenizer")
    container = [asr, sse, task, loader, trainer, transform, tokenizer]


class ApsModules(object):
    """Lazy submodule lists: importing them triggers registration."""
    asr_submodules = [
        "aps_tpu.asr.att", "aps_tpu.asr.ctc", "aps_tpu.asr.enh_att",
        "aps_tpu.asr.transducers", "aps_tpu.asr.lm.rnn",
        "aps_tpu.asr.lm.transformer", "aps_tpu.streaming_asr.ctc",
        "aps_tpu.streaming_asr.transducers"
    ]
    sse_submodules = [
        "aps_tpu.sse.toy", "aps_tpu.sse.bss.tcn", "aps_tpu.sse.bss.dccrn",
        "aps_tpu.sse.bss.dprnn", "aps_tpu.sse.bss.sepformer",
        "aps_tpu.sse.bss.dense_unet", "aps_tpu.sse.bss.chimera",
        "aps_tpu.sse.bss.transformer", "aps_tpu.sse.enh.dcunet",
        "aps_tpu.sse.enh.phasen", "aps_tpu.sse.enh.demucs",
        "aps_tpu.sse.enh.dfsmn", "aps_tpu.sse.unsuper.rnn",
        "aps_tpu.rt_sse.enh.dfsmn", "aps_tpu.rt_sse.enh.transformer"
    ]
    task_submodules = ["aps_tpu.task.asr", "aps_tpu.task.sse",
                       "aps_tpu.task.ml", "aps_tpu.task.ts"]
    loader_submodules = [
        "aps_tpu.loader.am.raw", "aps_tpu.loader.am.kaldi",
        "aps_tpu.loader.am.simu_cmd", "aps_tpu.loader.se.chunk",
        "aps_tpu.loader.se.config", "aps_tpu.loader.se.simu_cmd",
        "aps_tpu.loader.lm.utt", "aps_tpu.loader.lm.bptt"
    ]
    trainer_submodules = ["aps_tpu.trainer.dp"]
    transform_submodules = ["aps_tpu.transform.asr", "aps_tpu.transform.enh"]
    tokenizer_submodules = ["aps_tpu.tokenizer.word", "aps_tpu.tokenizer.subword"]

    @staticmethod
    def import_all():
        for attr in [
                "asr_submodules", "sse_submodules", "task_submodules",
                "loader_submodules", "trainer_submodules",
                "transform_submodules", "tokenizer_submodules"
        ]:
            import_module_list(getattr(ApsModules, attr))


def import_module_list(modules: Iterable[str]):
    for m in modules:
        try:
            importlib.import_module(m)
        except ModuleNotFoundError as e:
            # tolerate not-yet-implemented submodules; re-raise real
            # import errors from existing modules
            if e.name and e.name.startswith("aps_tpu"):
                logger.warning(f"Skip missing submodule: {m}")
            else:
                raise


def dynamic_importlib(sstr: str) -> Any:
    """Load a user class from "/path/to/module.py:ClassName" (plug-in hook)."""
    path, cls_name = sstr.split(":")
    pkg_name = os.path.basename(path).split(".")[0]
    spec = importlib.util.spec_from_file_location(pkg_name, path)
    libs = importlib.util.module_from_spec(spec)
    if pkg_name not in sys.modules:
        sys.modules[pkg_name] = libs
    spec.loader.exec_module(libs)
    if not hasattr(libs, cls_name):
        raise ImportError(f"Import {sstr} failed: no class {cls_name}")
    return getattr(libs, cls_name)


def _lookup(registry: Register, submodules, name: str, what: str):
    if ":" in name:
        return dynamic_importlib(name)
    import_module_list(submodules)
    if name not in registry:
        raise ValueError(
            f"Unsupported {what}: {name}, known: {registry.keys_str()}")
    return registry[name]


def aps_dataloader(fmt: str = "am@raw", **kwargs):
    """Return a dataloader iterable registered under `fmt`."""
    cls = _lookup(ApsRegisters.loader, ApsModules.loader_submodules, fmt,
                  "dataloader")
    return cls(**kwargs)


def aps_task(task: str, nnet, **kwargs):
    """Build a Task module wrapping `nnet`."""
    cls = _lookup(ApsRegisters.task, ApsModules.task_submodules, task, "task")
    # reference task_conf names the loss choice "objf"
    # (e.g. conf/sse/wham/1b.yaml); our flax task dataclasses reserve
    # .objf for the objective method, so the field is objf_name
    if "objf" in kwargs:
        kwargs["objf_name"] = kwargs.pop("objf")
    return cls(nnet=nnet, **kwargs)


def aps_transform(name: str):
    cls = _lookup(ApsRegisters.transform, ApsModules.transform_submodules,
                  name, "transform")
    return cls


def aps_tokenizer(name: str):
    cls = _lookup(ApsRegisters.tokenizer, ApsModules.tokenizer_submodules,
                  name, "tokenizer")
    return cls


def aps_asr_nnet(nnet: str):
    cls = _lookup(ApsRegisters.asr, ApsModules.asr_submodules, nnet,
                  "asr nnet")
    return cls


def aps_sse_nnet(nnet: str):
    cls = _lookup(ApsRegisters.sse, ApsModules.sse_submodules, nnet,
                  "sse nnet")
    return cls


def aps_trainer(trainer: str = "dp"):
    cls = _lookup(ApsRegisters.trainer, ApsModules.trainer_submodules, trainer,
                  "trainer")
    return cls


def start_trainer(trainer: str,
                  conf: Dict,
                  nnet,
                  args,
                  reduction_tag: str = "none",
                  other_loader_conf: Optional[Dict] = None) -> None:
    """Assemble task + trainer + loaders from an experiment config and run.

    Mirrors /root/reference/aps/libs.py:202-279 but SPMD-style: one python
    process drives the whole mesh, the global batch stays global and the
    trainer shards it over the "data" mesh axis — no per-rank batch division.
    """
    import yaml

    task = aps_task(conf["task"], nnet, **conf.get("task_conf", {}))
    trainer_cls = aps_trainer(trainer)
    trainer_conf = dict(conf["trainer_conf"])
    trn = trainer_cls(task,
                      checkpoint=args.checkpoint,
                      resume=getattr(args, "resume", ""),
                      init=getattr(args, "init", ""),
                      save_interval=getattr(args, "save_interval", -1),
                      prog_interval=getattr(args, "prog_interval", 100),
                      tensorboard=getattr(args, "tensorboard", False),
                      reduction_tag=reduction_tag,
                      **trainer_conf)

    # dump assembled config beside checkpoints (single source of truth for eval)
    if trn.is_chief:
        os.makedirs(args.checkpoint, exist_ok=True)
        conf["cmd_args"] = vars(args)
        with open(os.path.join(args.checkpoint, "train.yaml"), "w") as f:
            yaml.dump(conf, f)

    data_conf = conf["data_conf"]
    loader_conf = {
        "fmt": data_conf["fmt"],
        "num_workers": getattr(args, "num_workers", 0),
        "max_batch_size": args.batch_size,
    }
    loader_conf.update(data_conf.get("loader", {}))
    if other_loader_conf:
        loader_conf.update(other_loader_conf)

    trn_loader = aps_dataloader(train=True,
                                **loader_conf,
                                **data_conf["train"])
    # validation may need a smaller batch (e.g. longer max_dur utterances):
    # batch_size / dev_batch_factor, as in the reference's aps/opts.py:302.
    # Derive from the effective loader batch size so a YAML-level
    # max_batch_size override is respected
    dev_factor = max(float(getattr(args, "dev_batch_factor", 1)), 1.0)
    dev_loader_conf = dict(loader_conf)
    dev_loader_conf["max_batch_size"] = max(
        int(loader_conf["max_batch_size"] / dev_factor), 1)
    dev_loader = aps_dataloader(train=False,
                                **dev_loader_conf,
                                **data_conf["valid"])
    trn.run(trn_loader,
            dev_loader,
            num_epochs=getattr(args, "epochs", 50),
            eval_interval=getattr(args, "eval_interval", -1))
