"""Decompose the Pancreas train step cost (VERDICT r2 #8).

jax.profiler device traces don't capture through the axon relay, so
this attributes the 506 ms step by timing nested sub-programs, each
jitted and amortized over K iterations (relay-safe protocol):

  fwd_student   — student forward only (train mode, with projection)
  fwd_both      — student + teacher forwards
  full_step     — the real train step (losses + grad + clip + SGD +
                  EMA + guard); with --remat full the backward re-runs
                  the student forward

Differences between consecutive rows localize cost (backward ~=
full_step - fwd_both - fwd_student under remat). One JSON line per row.
Usage: python scripts/exp_step_profile.py [--dataset pancreas]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", ".jax_cache")

CONFIGS = {
    "pancreas": dict(batch_size=8, labeled_bs=4, patch_size=(112, 112, 96)),
    "brats19": dict(batch_size=8, labeled_bs=4, patch_size=(96, 96, 96)),
    "isles22": dict(batch_size=2, labeled_bs=1, patch_size=(96, 96, 64)),
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--dataset", type=str, default="pancreas")
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--rows", nargs="*", default=None,
                   help="subset of rows (fwd_student fwd_both fwd_loss grad full_step)")
    p.add_argument("--remat", type=str, default="full", choices=["none", "full"],
                   help="'none' skips the backward's forward recompute "
                        "(folded bf16 activations may now fit 16GB where "
                        "round-1 NDHWC f32 OOMed)")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    from dycon_paper_replication_tpu.config import make_config
    from dycon_paper_replication_tpu.models import net_factory_3d
    from dycon_paper_replication_tpu.train.state import create_train_state, make_optimizer
    from dycon_paper_replication_tpu.train.step import StepScalars, build_train_step

    cfg = make_config(args.dataset, compute_dtype="bfloat16", remat=args.remat,
                      **CONFIGS[args.dataset])
    model = net_factory_3d(cfg.model, in_chns=cfg.in_ch, class_num=cfg.num_classes,
                           scaler=cfg.feature_scaler, compute_dtype=jnp.bfloat16,
                           layout=cfg.resolved_layout())
    opt = make_optimizer(lambda s: cfg.base_lr)
    state = create_train_state(model, jax.random.key(0), opt)
    full = jax.jit(build_train_step(model, opt, cfg))

    bs, ps = cfg.batch_size, cfg.patch_size
    rng = np.random.default_rng(0)
    label = rng.integers(0, 2, size=(bs, *ps)).astype(np.int32)
    image = jnp.asarray(label[..., None] + rng.normal(size=(bs, *ps, 1)), jnp.float32)
    labels = jnp.asarray(label)
    sc = StepScalars.make(5.0, 0.01, 1.3, 0.3)
    key = jax.random.key(1)

    def timed(name, f):
        # amortize inside jit via lax.fori_loop is impossible for state-
        # carrying fns of different shapes; use repeated dispatch + one
        # final forced sync (dispatch is async; the relay only hurts the
        # last fetch)
        out = f()
        jax.block_until_ready(out)
        # forced scalar D2H to really sync through the relay
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32).ravel()[0]))
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = f()
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32).ravel()[0]))
        ms = (time.perf_counter() - t0) / args.iters * 1e3
        print(json.dumps({"row": name, "ms": round(ms, 1)}), flush=True)

    noisy = image + 0.1  # stand-in for the step's noise injection

    @jax.jit
    def fwd_student(params, mstate):
        (sdf, seg, feat), _ = model.apply(params, mstate, image, train=True,
                                          rng=jax.random.key(3))
        return seg

    @jax.jit
    def fwd_both(params, mstate, tparams, tstate):
        (s1, seg, f1), _ = model.apply(params, mstate, image, train=True,
                                       rng=jax.random.key(3))
        (s2, seg2, f2), _ = model.apply(tparams, tstate, noisy,
                                        train=cfg.teacher_train_mode,
                                        rng=jax.random.key(4))
        return seg + seg2

    rows = {
        "fwd_student": lambda: fwd_student(state.params, state.model_state),
        "fwd_both": lambda: fwd_both(state.params, state.model_state,
                                     state.teacher_params, state.teacher_state),
        "full_step": lambda: full(state, {"image": image, "label": labels}, key, sc)[1],
    }
    sel = args.rows or list(rows)
    print(f"# layout={cfg.resolved_layout()} patch={ps} bs={bs} remat={cfg.remat}",
          file=sys.stderr, flush=True)
    for name in sel:
        timed(name, rows[name])


if __name__ == "__main__":
    main()
