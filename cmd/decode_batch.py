#!/usr/bin/env python
"""Batched ASR decoding (parity: /root/reference/cmd/decode_batch.py):
groups utterances and dispatches their compiled beam searches back-to-back
(shape-bucketed so XLA reuses programs)."""

import argparse
import pprint

import jax.numpy as jnp

from aps_tpu.eval import TextPostProcessor
from aps_tpu.io import AudioReader, io_wrapper
from aps_tpu.opts import DecodingParser
from aps_tpu.utils import SimpleTimer, get_logger

from decode import FasterDecoder, beam_search_params

logger = get_logger(__name__)


def quantize_dur(num_samples: int, grid: float = 1.25,
                 base: int = 16000) -> int:
    """Geometric duration grid: all utterances in a bucket pad to the same
    sample count, so only a handful of beam-search programs ever compile."""
    length = base
    while length < num_samples:
        length = int(length * grid)
    return length


def run(args):
    from aps_tpu.utils import enable_compilation_cache
    enable_compilation_cache()
    print(f"Arguments in args:\n{pprint.pformat(vars(args))}", flush=True)
    decoder = FasterDecoder(args.am, cpt_tag=args.am_tag,
                            function="beam_search",
                            device_id=args.device_id)
    src_reader = AudioReader(args.feats_or_wav_scp, sr=args.sr,
                             channel=args.channel)
    processor = TextPostProcessor(args.dict, space=args.space,
                                  show_unk=args.show_unk, spm=args.spm)
    kwargs = {k: getattr(args, k) for k in beam_search_params
              if hasattr(args, k)}
    if getattr(args, "disable_unk", False):
        if not args.dict:
            raise RuntimeError("--disable-unk needs --dict to look up "
                               "the <unk> id")
        from aps_tpu.conf import load_dict
        from aps_tpu.const import UNK_TOKEN
        kwargs["unk"] = load_dict(args.dict)[UNK_TOKEN]
    if args.data_parallel:
        import jax

        from aps_tpu.parallel import build_mesh
        if args.batch_size % jax.device_count():
            raise RuntimeError(
                f"--batch-size {args.batch_size} must divide the "
                f"{jax.device_count()}-device mesh for --data-parallel")
        kwargs["mesh"] = build_mesh()
        logger.info(f"Data-parallel decoding over {jax.device_count()} "
                    f"devices")
    stdout_top, top = io_wrapper(args.best, "w")
    # establish the device<->host data plane before the RTF timer
    # (first-fetch session stall on a networked device; see
    # cmd/separate.py:253 note — ~1 ms on local TPU hardware)
    import numpy as _np
    _np.asarray(jnp.zeros((), jnp.float32) + 1.0)
    timer = SimpleTimer()
    tot_utts, tot_dur = 0, 0
    # bucket utterances on a geometric duration grid; decode each full
    # bucket as ONE compiled batched search
    buckets = {}

    def flush_bucket(entries, bucket=-1):
        nonlocal tot_utts
        keys = [k for k, _ in entries]
        hyps = decoder.run_batch([s for _, s in entries], pad_to=bucket,
                                 **kwargs)
        for key, nbest in zip(keys, hyps):
            trans = processor.run(nbest[0]["trans"][1:-1])
            top.write(f"{key}\t{trans}\n")
        tot_utts += len(entries)
        top.flush()
        logger.info(f"Processed {tot_utts} utterances ...")

    # prefetch wav reads on a background thread so disk IO overlaps
    # the device-side batched searches (aps_tpu/eval/pipeline.py)
    from aps_tpu.eval.pipeline import prefetch_iter
    for key, src in prefetch_iter(iter(src_reader),
                                  depth=2 * args.batch_size):
        bucket = quantize_dur(src.shape[-1], base=args.sr)
        buckets.setdefault(bucket, []).append((key, src))
        tot_dur += src.shape[-1] / args.sr
        if len(buckets[bucket]) == args.batch_size:
            flush_bucket(buckets.pop(bucket), bucket=bucket)
    for bucket, entries in buckets.items():
        flush_bucket(entries, bucket=bucket)
    cost = timer.elapsed() * 60
    logger.info(f"Decoded {tot_utts} utterances in {cost:.1f}s, "
                f"RTF = {cost / max(tot_dur, 1e-6):.4f}")
    if not stdout_top:
        top.close()


if __name__ == "__main__":
    parser = argparse.ArgumentParser(
        description="Batch ASR decoding",
        formatter_class=argparse.ArgumentDefaultsHelpFormatter,
        parents=[DecodingParser.parser])
    parser.add_argument("--sr", type=int, default=16000)
    parser.add_argument("--space", type=str, default="")
    parser.add_argument("--show-unk", type=str, default="<unk>")
    parser.add_argument("--batch-size", type=int, default=8)
    parser.add_argument("--data-parallel", action="store_true",
                        help="Shard each decode batch over ALL local "
                        "devices (multi-chip data-parallel inference); "
                        "batch-size must divide the device count")
    run(parser.parse_args())
