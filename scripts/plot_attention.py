"""Plot text->audio cross-attention maps from a trained text-GAN checkpoint.

Evidence artifact for the text-conditioned path (reference
universe_gan_NS_11May.py guided-attention training): loads a checkpoint
through the real inference loader, runs the text conditioner on val
utterances + their transcripts, and renders the mean-over-heads
cross-attention maps (mel-frame query x text-token key) with a
diagonality score (fraction of attention mass within a +/-15% band
around the ideal monotonic diagonal, computed over valid tokens).

    python scripts/plot_attention.py exp/synth_text_16k_cpu \
        data/synthetic_text/val --out QUALITY_attention.png
"""
import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402


def diagonality(attn, n_tok):
    """attn: (Q, S). Mass within |s/S - q/Q| <= 0.15 over valid tokens."""
    q, _s = attn.shape
    a = attn[:, :n_tok]
    a = a / (a.sum(axis=1, keepdims=True) + 1e-9)
    qs = np.arange(q)[:, None] / max(q - 1, 1)
    ss = np.arange(n_tok)[None, :] / max(n_tok - 1, 1)
    band = np.abs(qs - ss) <= 0.15
    return float((a * band).sum() / q)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("val_dir")
    ap.add_argument("--step", default=None)
    ap.add_argument("--n", type=int, default=3)
    ap.add_argument("--out", default="QUALITY_attention.png")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from open_universe_tpu.data.wavio import read_wav
    from open_universe_tpu.text import CharTokenizer
    from open_universe_tpu.training.checkpoint import (
        load_model_for_inference,
    )

    step = args.step
    if step is not None and step not in ("best", "last"):
        step = int(step)
    model, params, cfg = load_model_for_inference(args.ckpt, step=step)
    tcfg = cfg["model"].get("text", {})
    tok = CharTokenizer(max_len=tcfg.get("text_max_len", 128))

    noisy_dir = Path(args.val_dir) / "noisy"
    text_dir = Path(args.val_dir) / "text"
    files = sorted(noisy_dir.glob("*.wav"))[:args.n]

    fig, axes = plt.subplots(1, len(files), figsize=(4.6 * len(files), 3.6))
    axes = np.atleast_1d(axes)
    scores = []
    for ax, f in zip(axes, files):
        wav, fs = read_wav(str(f))
        x = jnp.asarray(wav[:, 0], jnp.float32)
        t = x.shape[0]
        grid = model.tot_ds
        x = jnp.pad(x, (0, -t % grid))[None, :, None]
        txt = (text_dir / f"{f.stem}.txt").read_text().strip()
        ids, mask = tok([txt])
        (x_n, _), *_ = model.normalize_batch((x, x))
        xt, _ = model.apply_transform(x_n)
        _c, _y, _h, info = model.apply_cond_with_info(
            params, xt, x_wav=x_n, text=(jnp.asarray(ids),
                                         jnp.asarray(mask)))
        attn = np.asarray(info["attn_map"][0])  # (Q, S)
        n_tok = int((~np.asarray(mask[0])).sum())
        d = diagonality(attn, n_tok)
        scores.append(d)
        ax.imshow(attn[:, :n_tok].T, aspect="auto", origin="lower",
                  interpolation="nearest", cmap="magma")
        ax.set_xlabel("mel frame")
        ax.set_ylabel("text token")
        ax.set_title(f"{f.stem}  diag={d:.2f}", fontsize=9)
    fig.suptitle(f"cross-attention ({args.ckpt} @ step "
                 f"{step or 'last'})", fontsize=10)
    fig.tight_layout()
    fig.savefig(args.out, dpi=110)
    print(f"mean diagonality {np.mean(scores):.3f} over {len(scores)} "
          f"utterances -> {args.out}")


if __name__ == "__main__":
    main()
