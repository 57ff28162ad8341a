"""Diagnose why a well-trained tiny score net gives garbage from the
sampler. Trains (or loads cached) tiny MDN state, then probes:
  1. one-step denoise: x0_hat = x_t + sigma^2 * score(x_t)  vs target
  2. sampler trajectory: ||x_n - target|| per step
  3. raw vs EMA params
"""
import os
import pickle
import sys

import jax
import jax.numpy as jnp
import numpy as np

from open_universe_tpu.metrics.sisdr import si_sdr
from open_universe_tpu.runtime import build_model, build_trainer
from open_universe_tpu.diffusion.schedule import sampler_coefficients

sys.path.insert(0, os.path.dirname(__file__))
from train_convergence import make_batch  # noqa: E402

import os
# repo-local cache (not /tmp: world-writable + pickle.load)
CACHE = os.path.join(os.path.dirname(__file__), "..",
                     ".debug_sampler_state.pkl")


def main():
    fs, t = 800, 1600
    model = build_model({
        "fs": fs, "rate_factors": [2, 4], "n_channels": 8, "n_rff": 8,
        "noise_cond_dim": 64, "n_mels": 16, "use_signal_decoupling": False,
        "diffusion": {"n_steps": 8, "sigma_min": 0.05},
    })
    trainer = build_trainer(model, {
        "kind": "mdn", "audio_len_s": t / fs,
        "lr": 1e-3, "t_warmup": 50, "t_cosine": 4000, "t_max": 8000,
    })
    if os.path.exists(CACHE):
        with open(CACHE, "rb") as f:
            raw = pickle.load(f)
        params, ema = jax.tree.map(jnp.asarray, raw)
        print("loaded cached state", flush=True)
    else:
        state = trainer.init(jax.random.PRNGKey(0), batch=2)
        step_fn = jax.jit(trainer.train_step)
        key = jax.random.PRNGKey(1)
        for i in range(4000):
            kb, ks, key = jax.random.split(key, 3)
            state, m = step_fn(state, make_batch(kb, 8, t, fs), ks)
            if i % 500 == 0:
                print(f"step {i} score={float(m['train/score']):.4f}",
                      flush=True)
        params, ema = state.params, state.ema.params
        with open(CACHE, "wb") as f:
            pickle.dump(jax.device_get((params, ema)), f)

    mix, clean = make_batch(jax.random.PRNGKey(99), 8, t, fs)
    (nmix, nclean), *_ = model.normalize_batch((mix, clean))

    for tag, p in [("raw", params), ("ema", {**params, **ema})]:
        gen = {"score": p["score"], "cond": p["cond"]}
        cond, y_est, _ = model.apply_cond(gen, nmix, x_wav=nmix)
        score_fn = model.score_fn(gen)

        # 1. one-step denoise at several sigmas
        print(f"--- {tag}")
        for sig in [2.0, 0.5, 0.1]:
            z = jax.random.normal(jax.random.PRNGKey(7), nclean.shape)
            x_t = nclean + sig * z
            s = score_fn(x_t, jnp.full((8,), sig), cond)
            x0 = x_t + sig**2 * s
            sdr = float(jnp.mean(si_sdr(x0[..., 0], nclean[..., 0])))
            mse = float(jnp.mean((sig * s + z) ** 2))
            print(f"  sigma={sig:4.2f}: score_mse={mse:7.4f} "
                  f"one-step SI-SDR={sdr:7.2f} dB")

        # 2. sampler trajectory
        sigma, eta, beta = sampler_coefficients(model.cfg.diffusion)
        key = jax.random.PRNGKey(5)
        key, k0 = jax.random.split(key)
        x = sigma[0] * jax.random.normal(k0, nclean.shape)
        for n in range(len(sigma) - 1):
            key, kz = jax.random.split(key)
            s = score_fn(x, jnp.full((8,), sigma[n]), cond)
            z = sigma[n + 1] * jax.random.normal(kz, x.shape)
            x = x + sigma[n] ** 2 * eta * s + beta * z
            err = float(jnp.sqrt(jnp.mean((x - nclean) ** 2)))
            print(f"  step {n} sigma={float(sigma[n]):7.4f} "
                  f"rms(x-clean)={err:8.4f}")
        s = score_fn(x, jnp.full((8,), sigma[-1]), cond)
        x = x + sigma[-1] ** 2 * s
        err = float(jnp.sqrt(jnp.mean((x - nclean) ** 2)))
        sdr = float(jnp.mean(si_sdr(x[..., 0], nclean[..., 0])))
        print(f"  final: rms={err:.4f} SI-SDR={sdr:7.2f} dB "
              f"(clean rms={float(jnp.sqrt(jnp.mean(nclean**2))):.4f})")

        enh = jax.jit(lambda pp, m, k: model.enhance(pp, m, k))(
            p, mix[..., 0], jax.random.PRNGKey(5))
        sdr_e = float(np.mean(np.asarray(si_sdr(enh, clean[..., 0]))))
        print(f"  enhance() SI-SDR={sdr_e:7.2f} dB")


if __name__ == "__main__":
    main()
