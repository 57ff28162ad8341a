"""Enhancement CLI.

Usage:
    python -m open_universe_tpu.bin.enhance <input> <output> --ckpt <dir>
        [--n-steps 8 --epsilon 1.3 --ensemble 4 ...]

Parity target: reference ``bin/enhance.py`` (84-192): folder or single
file, flags auto-derived from the model's ``enhance()`` signature,
deterministic seed, resample in/out.
"""
import argparse
from pathlib import Path


def main(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input", help="input wav file or folder")
    parser.add_argument("output", help="output wav file or folder")
    parser.add_argument("--ckpt", required=True,
                        help="checkpoint dir, a reference torch "
                             "weights.ckpt dir/file, or a hub spec "
                             "repo_id[:revision] resolved against "
                             "$OPEN_UNIVERSE_HUB_CACHE (reference "
                             "model_loader.py:33-133 parity)")
    parser.add_argument("--step", default=None,
                        help="checkpoint step number, or 'best' for the "
                             "best-val/score checkpoint (default: latest)")
    parser.add_argument("--no-ema", action="store_true")
    parser.add_argument("--compute-dtype", default=None,
                        help="matmul/conv operand dtype (default: bfloat16 "
                             "on accelerators, float32 on CPU)")
    parser.add_argument("--param-dtype", default=None,
                        choices=["float32", "bfloat16"],
                        help="weight storage dtype (default: follows "
                             "--compute-dtype; bf16 halves HBM weight "
                             "traffic on the sampler loop)")
    parser.add_argument("--pallas-gru", action="store_true",
                        help="fused Pallas GRU recurrence (TPU serving)")
    parser.add_argument("--seed", type=int, default=682479040)
    parser.add_argument("--batch", type=int, default=1,
                        help="process N same-length-bucket files per "
                             "sampler call (throughput mode for folder "
                             "inputs; the reference enhances one file at "
                             "a time, bin/enhance.py:173-192). Note: the "
                             "sampler noise is drawn per batch, so "
                             "outputs differ (seeded, valid) from "
                             "--batch 1's file-sequential draws")
    parser.add_argument("--chunk-seconds", type=float, default=None,
                        help="enhance very long files in fixed-size "
                             "chunks with cross-faded overlap-add "
                             "(bounded memory, one XLA compile; "
                             "inference/streaming.py). The reference "
                             "processes long inputs whole")
    parser.add_argument("--overlap-seconds", type=float, default=0.5)
    parser.add_argument("--text-dir", default=None,
                        help="folder of <stem>.txt transcripts for "
                             "text-conditioned models (enhance_NS parity)")
    parser.add_argument("--oracle-ref-dir", default=None,
                        help="DEBUG: folder of matching clean wavs; runs "
                             "the sampler with the analytic oracle score "
                             "-(x-target)/sigma^2 (+ --fake-score-snr dB "
                             "of noise) instead of the network — the "
                             "reference's fake_score_snr test mechanism "
                             "(universe.py:278-298). Proves the serving "
                             "pipeline (pad/normalize/transform/sampler/"
                             "inverse) is quality-transparent "
                             "independently of training state")

    from ..models.universe.model import UniverseModel
    from .common import add_enhance_arguments, collect_enhance_kwargs

    add_enhance_arguments(parser, UniverseModel.enhance)
    args = parser.parse_args(argv)

    import math

    import jax

    from .common import respect_platform_env
    respect_platform_env()
    import jax.numpy as jnp
    import numpy as np

    from ..data.wavio import read_wav, write_wav
    from ..training.checkpoint import load_model_for_inference

    # serving precision (see PERF.md: bf16 output correlates 1.000000
    # with f32 and is the production path on TPU)
    on_accel = jax.default_backend() not in ("cpu",)
    dtype = args.compute_dtype or ("bfloat16" if on_accel else "float32")
    if dtype != "float32":
        from ..ops.conv import set_compute_dtype
        set_compute_dtype(dtype)
    if args.pallas_gru and jax.default_backend() in ("tpu", "axon"):
        from ..ops.gru import set_use_pallas_gru  # Mosaic kernel: TPU-only
        set_use_pallas_gru(True)

    step = args.step
    if step is not None and step != "best":
        step = int(step)
    from ..inference.model_hub import resolve_model_source
    ckpt_dir = resolve_model_source(args.ckpt)
    model, params, cfg = load_model_for_inference(
        ckpt_dir, step=step, use_ema=not args.no_ema)
    # bf16-stored params on accelerators: the enhance path is HBM-bound and
    # re-reads the full weight set at every sampler step; bf16 storage halves
    # that traffic (+10% measured, output corr 1.000000 — PERF.md).
    pdtype = args.param_dtype or ("bfloat16" if dtype != "float32" else
                                  "float32")
    if pdtype != "float32":
        params = jax.tree_util.tree_map(
            lambda x: x.astype(pdtype) if x.dtype == jnp.float32 else x,
            params)
    fs_model = cfg["model"].get("fs", 16000)
    kwargs = collect_enhance_kwargs(args, UniverseModel.enhance)

    # resolve which checkpoint actually got loaded so outputs are
    # self-describing (round-2 postmortem: an unlabeled eval silently
    # scored a near-untrained model — VERDICT item 2ii)
    from ..training.checkpoint import best_step, latest_step
    resolved_step = step
    if step == "best":
        resolved_step = best_step(ckpt_dir)
    elif step is None:
        resolved_step = latest_step(ckpt_dir)
    provenance = {"ckpt": str(ckpt_dir), "step_arg": args.step,
                  "resolved_step": resolved_step, "param_dtype": pdtype,
                  "compute_dtype": dtype, "ema": not args.no_ema,
                  "seed": args.seed}
    print("serving checkpoint: "
          + " ".join(f"{k}={v}" for k, v in provenance.items()), flush=True)

    import json

    in_path, out_path = Path(args.input), Path(args.output)
    if in_path.is_dir():
        files = sorted(p for p in in_path.glob("*.wav"))
        out_path.mkdir(parents=True, exist_ok=True)
        with open(out_path / "enhance_meta.json", "w") as f:
            json.dump(provenance, f, indent=2)
        pairs = [(p, out_path / p.name) for p in files]
    else:
        if out_path.suffix != ".wav":
            out_path.mkdir(parents=True, exist_ok=True)
            pairs = [(in_path, out_path / in_path.name)]
        else:
            pairs = [(in_path, out_path)]

    key = jax.random.PRNGKey(args.seed)

    tokenizer = None
    if args.text_dir is not None:
        from ..text import CharTokenizer
        tcfg = cfg["model"].get("text", {})
        tokenizer = CharTokenizer(max_len=tcfg.get("text_max_len", 128))

    @jax.jit
    def enhance(params, mix, key):
        return model.enhance(params, mix, key, **kwargs)

    @jax.jit
    def enhance_text(params, mix, key, ids, mask):
        return model.enhance(params, mix, key, text=(ids, mask), **kwargs)

    @jax.jit
    def enhance_oracle(params, mix, key, target):
        return model.enhance(params, mix, key, target=target, **kwargs)

    def load_one(src):
        wav, fs = read_wav(src)
        x = wav[:, 0]
        if fs != fs_model:
            from scipy.signal import resample_poly
            g = math.gcd(fs, fs_model)
            x = resample_poly(x, fs_model // g, fs // g)
        # pad to a coarse length grid so jit compiles once per bucket,
        # not once per file length
        t = len(x)
        grid = model.tot_ds * 25  # 0.25 s at 16 kHz
        t_pad = -(-t // grid) * grid
        return np.pad(x, (0, t_pad - t)), t, fs

    def write_one(dst, est, t, fs, src):
        est = np.asarray(est, np.float32)[:t]
        if fs != fs_model:
            from scipy.signal import resample_poly
            g = math.gcd(fs, fs_model)
            est = resample_poly(est, fs // g, fs_model // g)
        write_wav(dst, est, fs)
        print(f"{src} -> {dst}")

    def text_for(src):
        if tokenizer is None:
            return None
        tp = Path(args.text_dir) / f"{src.stem}.txt"
        if tp.exists():
            txt = tp.read_text().strip()
            if txt != "<not-available>":
                return txt
        return None

    if args.batch > 1 and args.oracle_ref_dir is not None:
        raise SystemExit("--oracle-ref-dir is a per-file debug path; "
                         "drop --batch to use it")
    if args.batch > 1 and tokenizer is None and len(pairs) > 1:
        # throughput mode: group files into same-padded-length buckets
        # and run the 8-step sampler once per batch — the sampler is the
        # hot loop and batches near-linearly on the MXU (PERF.md: 1289
        # audio-s/s/chip at batch 128 vs ~161x realtime at batch 1)
        loaded = [(src, dst, *load_one(src)) for src, dst in pairs]
        buckets = {}
        for item in loaded:
            buckets.setdefault(len(item[2]), []).append(item)
        for t_pad in sorted(buckets):
            items = buckets[t_pad]
            for i in range(0, len(items), args.batch):
                chunk = items[i:i + args.batch]
                xs = np.stack([c[2] for c in chunk])
                key, k = jax.random.split(key)
                est = enhance(params, jnp.asarray(xs, jnp.float32), k)
                est = np.asarray(est)
                for (src, dst, _xp, t, fs), e in zip(chunk, est):
                    write_one(dst, e, t, fs, src)
        return

    for src, dst in pairs:
        xp, t, fs = load_one(src)
        key, k = jax.random.split(key)
        if args.chunk_seconds:
            from ..inference import enhance_streaming
            est = enhance_streaming(model, params, xp[:t], k,
                                    chunk_seconds=args.chunk_seconds,
                                    overlap_seconds=args.overlap_seconds,
                                    **kwargs)
            write_one(dst, np.asarray(est), t, fs, src)
            continue
        if args.oracle_ref_dir is not None:
            ref_p = Path(args.oracle_ref_dir) / src.name
            rp, _rt, _rfs = load_one(ref_p)
            est = enhance_oracle(params, jnp.asarray(xp, jnp.float32), k,
                                 jnp.asarray(rp, jnp.float32))
            write_one(dst, np.asarray(est), t, fs, src)
            continue
        txt = text_for(src)
        if txt:
            ids, mask = tokenizer([txt])
            est = enhance_text(params, jnp.asarray(xp, jnp.float32)[None, :],
                               k, jnp.asarray(ids), jnp.asarray(mask))[0]
        else:
            est = enhance(params, jnp.asarray(xp, jnp.float32), k)
        write_one(dst, np.asarray(est), t, fs, src)


if __name__ == "__main__":
    main()
