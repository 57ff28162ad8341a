"""Break down GAN train-step time on the real chip, f32 vs bf16 compute.

Run WITHOUT setting PYTHONPATH (it breaks the axon TPU plugin
registration on this image); the repo root is inserted here instead.
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp

from open_universe_tpu.runtime import build_model, build_trainer
from open_universe_tpu.losses.gan import discriminator_loss
from open_universe_tpu.ops.conv import set_compute_dtype


def timed(fn, *args, n_outer=2):
    float(fn(*args))
    best = float("inf")
    for _ in range(n_outer):
        t0 = time.perf_counter()
        float(fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best


def main():
    if "--bf16" in sys.argv:
        set_compute_dtype("bfloat16")
        print("compute dtype: bfloat16", flush=True)
    batch = 16
    for a in sys.argv[1:]:
        if a.startswith("--batch="):
            batch = int(a.split("=")[1])
    seconds = 4.0
    for a in sys.argv[1:]:
        if a.startswith("--seconds="):
            seconds = float(a.split("=")[1])
    print(f"batch={batch} seconds={seconds}", flush=True)
    t = int(16000 * seconds)
    n_inner = 2

    model = build_model({"fs": 16000})
    tcfg = {"kind": "gan"}
    if "--remat" in sys.argv:
        tcfg["remat"] = True
        print("remat: on", flush=True)
    if "--remat-disc" in sys.argv:
        tcfg["remat_disc"] = True
        print("remat_disc: on", flush=True)
    if "--accum" in sys.argv:
        tcfg["accumulate_grad_batches"] = 2
    trainer = build_trainer(model, tcfg)
    from open_universe_tpu.runtime import host_init
    state = host_init(trainer.init, jax.random.PRNGKey(0), example_len=1600,
                      batch=1)
    if "--pallas-gru" in sys.argv:
        from open_universe_tpu.ops.gru import set_use_pallas_gru
        set_use_pallas_gru(True)
        print("pallas gru: on", flush=True)
    if "--fold-cond" in sys.argv:
        from open_universe_tpu.models.universe.blocks import (
            set_fold_signal_cond,
        )
        set_fold_signal_cond(True)
        print("fold signal-cond: on", flush=True)

    key = jax.random.PRNGKey(1)
    mix = jax.random.normal(key, (batch, t, 1)) * 0.05
    tgt = mix * 0.9

    def leaf_sum(x):
        return sum(v.astype(jnp.float32).sum()
                   for v in jax.tree.leaves(x))

    @jax.jit
    def gen_fwd(state, mix, tgt, key):
        def body(c, i):
            sigma = jnp.full((batch,), 0.1)
            x_t = tgt + sigma[:, None, None] * 0.1
            def f(p):
                cond, y_raw, _ = model.apply_cond(p, mix * (1 + 1e-6 * c),
                                                  x_wav=mix)
                score = model.score_fn(p)(x_t, sigma, cond)
                y = model.aux_to_wav(p, y_raw)
                return score, y
            s, y = f(state.gen_params)
            return c + s.astype(jnp.float32).sum() + y.astype(
                jnp.float32).sum(), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n_inner))
        return acc

    @jax.jit
    def gen_fwd_bwd(state, mix, tgt, key):
        def body(c, i):
            sigma = jnp.full((batch,), 0.1)
            x_t = tgt + sigma[:, None, None] * 0.1
            def loss(p):
                cond, y_raw, _ = model.apply_cond(p, mix * (1 + 1e-6 * c),
                                                  x_wav=mix)
                score = model.score_fn(p)(x_t, sigma, cond)
                y = model.aux_to_wav(p, y_raw)
                return jnp.mean(score**2) + jnp.mean(y**2)
            g = jax.grad(loss)(state.gen_params)
            return c + leaf_sum(g), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n_inner))
        return acc

    @jax.jit
    def disc_fwd(state, mix, tgt, key):
        def body(c, i):
            fake = mix * (1 + 1e-6 * c)
            rf, gf, _, _ = trainer.mpd.apply(
                {"params": state.disc_params["mpd"]}, tgt, fake)
            lf, _, _ = discriminator_loss(rf, gf)
            rs, gs, _, _ = trainer.mrd.apply(
                {"params": state.disc_params["mrd"]}, tgt, fake)
            ls, _, _ = discriminator_loss(rs, gs)
            return c + lf + ls, None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n_inner))
        return acc

    @jax.jit
    def disc_fwd_bwd(state, mix, tgt, key):
        def body(c, i):
            fake = mix * (1 + 1e-6 * c)
            def loss(dp):
                rf, gf, _, _ = trainer.mpd.apply({"params": dp["mpd"]},
                                                 tgt, fake)
                lf, _, _ = discriminator_loss(rf, gf)
                rs, gs, _, _ = trainer.mrd.apply({"params": dp["mrd"]},
                                                 tgt, fake)
                ls, _, _ = discriminator_loss(rs, gs)
                return lf + ls
            g = jax.grad(loss)(state.disc_params)
            return c + leaf_sum(g), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n_inner))
        return acc

    @jax.jit
    def full_step(state, mix, tgt, key):
        def body(carry, i):
            st, acc = carry
            st2, m = trainer.train_step(st, (mix, tgt),
                                        jax.random.fold_in(key, i))
            return (st2, acc + m["train/loss_gen"]), None
        (st, acc), _ = jax.lax.scan(body, (state, jnp.zeros(())),
                                    jnp.arange(n_inner))
        return acc

    @jax.jit
    def cond_only(state, mix, tgt, key):
        def body(c, i):
            cond, y_raw, _ = model.apply_cond(state.gen_params,
                                              mix * (1 + 1e-6 * c))
            return c + y_raw.astype(jnp.float32).sum() + sum(
                x.astype(jnp.float32).sum() for x in cond), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n_inner))
        return acc

    @jax.jit
    def score_only(state, mix, tgt, key):
        cond, y_raw, _ = model.apply_cond(state.gen_params, mix)
        sigma = jnp.full((batch,), 0.1)
        def body(c, i):
            s = model.score_fn(state.gen_params)(
                tgt * (1 + 1e-6 * c), sigma, cond)
            return c + s.astype(jnp.float32).sum(), None
        acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n_inner))
        return acc

    # ---- staged replication of GanTrainer.train_step to find hidden costs
    from open_universe_tpu.diffusion.sigma_sampling import sample_sigma
    from open_universe_tpu.losses.gan import (
        discriminator_loss as d_loss,
        feature_loss,
        generator_loss,
    )
    import optax

    def _stage(upto):
        cfg = trainer.cfg
        mdl = trainer.model

        def fn(state, mix, tgt, key):
            def body(c, i):
                k_s, k_z = jax.random.split(jax.random.fold_in(key, i))
                (mx, tg), *_ = mdl.normalize_batch((mix * (1 + 1e-6 * c), tgt))
                sigma, _ = sample_sigma(k_s, mx.shape[0], mdl.cfg.diffusion,
                                        cfg.time_sampling)
                z = jax.random.normal(k_z, tg.shape, tg.dtype)
                x_t = tg + sigma[:, None, None] * z

                def gen_forward(gp):
                    cond, y_raw, _ = mdl.apply_cond(gp, mx, x_wav=mx)
                    score = mdl.score_fn(gp)(x_t, sigma, cond)
                    return score, mdl.aux_to_wav(gp, y_raw)

                (score, y_est), gen_vjp = jax.vjp(gen_forward,
                                                  state.gen_params)
                acc = score.astype(jnp.float32).sum() + y_est.astype(
                    jnp.float32).sum()
                if upto == "vjpfwd":
                    return c + acc, None
                y_det = jax.lax.stop_gradient(y_est)

                def dl(dp):
                    rf, gf, _, _ = trainer.mpd.apply({"params": dp["mpd"]},
                                                     tg, y_det)
                    lf, _, _ = d_loss(rf, gf)
                    rs, gs, _, _ = trainer.mrd.apply({"params": dp["mrd"]},
                                                     tg, y_det)
                    ls, _, _ = d_loss(rs, gs)
                    return lf + ls

                ld, dgrads = jax.value_and_grad(dl)(state.disc_params)
                if upto == "discgrad":
                    return c + acc + ld + sum(
                        v.astype(jnp.float32).sum()
                        for v in jax.tree.leaves(dgrads)), None
                dupd, dopt = trainer.disc_tx.update(dgrads, state.disc_opt,
                                                    state.disc_params)
                ndp = optax.apply_updates(state.disc_params, dupd)
                if upto == "discopt":
                    return c + acc + ld + sum(
                        v.astype(jnp.float32).sum()
                        for v in jax.tree.leaves(ndp)), None
                mel_t = mdl.compute_mel_spec(tg)

                def down(score, y_est):
                    l = jnp.mean((sigma[:, None, None] * score + z) ** 2)
                    l += 45.0 * jnp.mean(
                        jnp.abs(mdl.compute_mel_spec(y_est) - mel_t))
                    rf, gf, fr, fg = trainer.mpd.apply(
                        {"params": ndp["mpd"]}, tg, y_est, paired=False)
                    rs, gs, fr2, fg2 = trainer.mrd.apply(
                        {"params": ndp["mrd"]}, tg, y_est, paired=False)
                    l += (feature_loss(fr, fg) + feature_loss(fr2, fg2)
                          + generator_loss(gf)[0] + generator_loss(gs)[0])
                    return l

                lg, (ds, dy) = jax.value_and_grad(down, argnums=(0, 1))(
                    score, y_est)
                if upto == "downgrad":
                    return c + acc + ld + lg + ds.astype(
                        jnp.float32).sum() + dy.astype(jnp.float32).sum(), None
                (ggrads,) = gen_vjp((ds, dy))
                if upto == "pullback":
                    return c + acc + ld + lg + sum(
                        v.astype(jnp.float32).sum()
                        for v in jax.tree.leaves(ggrads)), None
                gupd, gopt = trainer.gen_tx.update(ggrads, state.gen_opt,
                                                   state.gen_params)
                ngp = optax.apply_updates(state.gen_params, gupd)
                return c + acc + ld + lg + sum(
                    v.astype(jnp.float32).sum()
                    for v in jax.tree.leaves(ngp)), None
            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n_inner))
            return acc
        return jax.jit(fn)

    # bisect INSIDE the downstream (generator-loss) grad: which term costs
    def _down(which):
        cfg = trainer.cfg
        mdl = trainer.model

        def fn(state, mix, tgt, key):
            (mx, tg), *_ = mdl.normalize_batch((mix, tgt))
            mel_t = mdl.compute_mel_spec(tg)
            sigma = jnp.full((mx.shape[0],), 0.1)

            def body(c, i):
                y_est = mx * (1 + 1e-6 * c)
                score = tg * (1 + 1e-6 * c)

                def down(score, y_est):
                    l = jnp.zeros(())
                    if "score" in which:
                        l += jnp.mean((sigma[:, None, None] * score
                                       + tg) ** 2)
                    if "mel" in which:
                        l += 45.0 * jnp.mean(
                            jnp.abs(mdl.compute_mel_spec(y_est) - mel_t))
                    if "mpd" in which:
                        rf, gf, fr, fg = trainer.mpd.apply(
                            {"params": state.disc_params["mpd"]}, tg, y_est,
                            paired=False)
                        l += feature_loss(fr, fg) + generator_loss(gf)[0]
                    if "mrd" in which:
                        rs, gs, fr2, fg2 = trainer.mrd.apply(
                            {"params": state.disc_params["mrd"]}, tg, y_est,
                            paired=False)
                        l += feature_loss(fr2, fg2) + generator_loss(gs)[0]
                    return l

                lg, (ds, dy) = jax.value_and_grad(down, argnums=(0, 1))(
                    score, y_est)
                return c + lg + ds.astype(jnp.float32).sum() + dy.astype(
                    jnp.float32).sum(), None
            acc, _ = jax.lax.scan(body, jnp.zeros(()), jnp.arange(n_inner))
            return acc
        return jax.jit(fn)

    variants = {"gen": [("gen fwd", gen_fwd), ("gen fwd+bwd", gen_fwd_bwd)],
                "stages": [(f"stage:{s}", _stage(s)) for s in
                           ("vjpfwd", "discgrad", "discopt", "downgrad",
                            "pullback", "genopt")],
                "down": [(f"down:{w}", _down(w)) for w in
                         ("score+mel", "mpd", "mrd")],
                "parts": [("cond only", cond_only),
                          ("cond + N score", score_only)],
                "disc": [("disc fwd (real+fake)", disc_fwd),
                         ("disc fwd+bwd", disc_fwd_bwd)],
                "full": [("FULL train step", full_step)]}
    sel = [a for a in sys.argv[1:] if not a.startswith("--")] or ["gen"]
    for s in sel:
        for name, fn in variants[s]:
            dt = timed(fn, state, mix, tgt, key) / n_inner
            print(f"{name:22s}: {dt*1e3:9.1f} ms", flush=True)


if __name__ == "__main__":
    main()
