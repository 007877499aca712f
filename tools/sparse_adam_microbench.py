# coding: utf-8
"""Dense vs row-sparse Adam table update: ms/step on the real TPU across
catalog sizes. Grounds the `row_sparse_table_update: auto` size heuristic
(engine/trainer.py) — the fast path trades two full-table HBM passes for
batch-proportional row scatters, so it loses at small catalogs and wins
when n_rows >> batch rows.

Usage: python tools/sparse_adam_microbench.py [--d 2048 --rows 1024]
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=2048)
    ap.add_argument("--rows", type=int, default=1024)  # 2B at bs=512
    ap.add_argument("--chain", type=int, default=32)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax

    from foodrec_tpu.engine.sparse_adam import row_sparse_adam_update
    from foodrec_tpu.utils.misc import enable_compilation_cache

    enable_compilation_cache()

    def lr_schedule(step):
        return 0.002 * 0.5 ** (step / 50)

    opt = optax.chain(optax.scale_by_adam(eps=1e-8),
                      optax.scale_by_learning_rate(lr_schedule))

    def bench_n(n):
        key = jax.random.PRNGKey(0)
        table = jax.random.normal(key, (n, args.d), jnp.float32)
        rows = jax.random.randint(key, (args.rows,), 0, n)
        g_rows = jax.random.normal(key, (args.rows, args.d), jnp.float32)
        state = opt.init({"t": table})

        @jax.jit
        def dense_chain(table, mu, nu):
            def body(_, c):
                t, m, v = c
                g = jnp.zeros_like(t).at[rows].add(g_rows)
                st = (state[0]._replace(mu={"t": m}, nu={"t": v}), state[1])
                upd, st2 = opt.update({"t": g}, st, {"t": t})
                t2 = optax.apply_updates({"t": t}, upd)["t"]
                return t2, st2[0].mu["t"], st2[0].nu["t"]
            return jax.lax.fori_loop(0, args.chain, body,
                                     (table, mu, nu))

        @jax.jit
        def sparse_chain(table, mu, nu):
            def body(_, c):
                t, m, v = c
                return row_sparse_adam_update(
                    t, m, v, rows, g_rows, count=state[0].count,
                    sched_count=state[1].count, lr_schedule=lr_schedule)
            return jax.lax.fori_loop(0, args.chain, body,
                                     (table, mu, nu))

        out = {}
        for name, fn in (("dense", dense_chain), ("sparse", sparse_chain)):
            try:
                mu = jnp.zeros_like(table)
                nu = jnp.zeros_like(table)
                r = fn(table, mu, nu)
                jax.block_until_ready(r)
                best = float("inf")
                for _ in range(3):
                    t0 = time.time()
                    jax.block_until_ready(fn(table, mu, nu))
                    best = min(best, (time.time() - t0) / args.chain)
                out[name] = best * 1e3
            except Exception as e:  # dense at XL: the zero-filled grad
                out[name] = None    # table alone is n*d*4 bytes extra
                print(f"n={n}: {name} failed ({type(e).__name__})",
                      file=sys.stderr)
        d_s = (f"{out['dense']:7.3f}ms" if out["dense"] else "   OOM  ")
        s_s = (f"{out['sparse']:7.3f}ms" if out["sparse"] else "   OOM  ")
        ratio = (f"{out['dense'] / out['sparse']:5.2f}x"
                 if out["dense"] and out["sparse"] else "  n/a")
        print(f"n={n:7d} d={args.d}: dense {d_s}/step  "
              f"sparse {s_s}/step  speedup {ratio}  "
              f"(n/rows={n // args.rows}x)", flush=True)

    for n in (29943, 65536, 131072, 299430):
        bench_n(n)


if __name__ == "__main__":
    main()
