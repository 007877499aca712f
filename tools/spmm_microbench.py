# coding: utf-8
"""SpMM kernel microbenchmark: forward+backward propagation timing and
numerics across implementations / MXU precisions on Foodcom-shaped graphs.

Usage: python tools/spmm_microbench.py  (needs the real TPU)

Round-2 question (PARITY.md profile): the Pallas kernels spend 1.88s/epoch
compute-bound on f32-HIGHEST MXU passes. HIGH (3-pass bf16 decomposition)
halves the MXU work; this measures the wall-clock and the max relative error
vs the segment_sum f32 reference to decide whether the parity gate (1e-5
relative) still holds.
"""

import argparse
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def build_graph(n_users, n_items, n_edges, seed=0):
    """Power-law bipartite user-item graph, symmetric-normalized, like the
    CIKM ui adjacency at Foodcom scale."""
    from foodrec_tpu.ops.graph import sym_normalized_adjacency

    rng = np.random.default_rng(seed)
    # zipf-ish item popularity
    pop = (1.0 / np.arange(1, n_items + 1) ** 0.8)
    pop /= pop.sum()
    u = rng.integers(0, n_users, n_edges)
    i = rng.choice(n_items, size=n_edges, p=pop) + n_users
    return sym_normalized_adjacency(u, i, n_users + n_items)


def timeit(fn, *args, iters=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters, out


def chain_timer(step, x, chain=64, reps=3):
    """Time `step` by chaining `chain` applications inside ONE dispatch.

    Per-dispatch tunnel latency (~100ms RTT on the axon link) swamps
    millisecond kernels when timed call-by-call — the r3 sweep first ran
    with 20 dispatched iterations and read 5ms floors on 0.6ms kernels.
    A lax.fori_loop keeps the chain on device so one RTT amortizes over
    `chain` applications."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def chained(x):
        def body(_, x):
            y = step(x)
            # renormalize so 64 chained hops can't overflow f32
            return y / jnp.maximum(jnp.abs(y).max(), 1e-30)
        return jax.lax.fori_loop(0, chain, body, x)

    out = chained(x)
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(reps):
        t0 = time.time()
        jax.block_until_ready(chained(x))
        best = min(best, (time.time() - t0) / chain)
    return best, out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--d", type=int, default=64)
    ap.add_argument("--edges", type=int, default=192000)
    ap.add_argument("--users", type=int, default=7596,
                    help="rows of the bipartite graph (Allrecipes ui: 68768)")
    ap.add_argument("--items", type=int, default=29943,
                    help="cols of the bipartite graph (Allrecipes ui: 45630)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from foodrec_tpu.ops import spmm
    from foodrec_tpu.ops.spmm import Propagator

    adj = build_graph(args.users, args.items, args.edges)
    print(f"graph: n={adj.n_nodes} nnz={adj.nnz} maxdeg={adj.max_degree}")
    x = jax.random.normal(jax.random.PRNGKey(1), (adj.n_nodes, args.d),
                          jnp.float32)

    seg = Propagator(adj, impl="segment", _with_vjp=False)
    y_ref = np.asarray(jax.jit(seg)(x))
    scale = np.abs(y_ref).max()

    def fwd_bwd_step(prop):
        def f(x):
            def loss(x):
                return jnp.sum(prop(x) ** 2)
            return jax.grad(loss)(x)
        return f

    for eb, rp in ((512, 256), (1024, 256), (2048, 256), (512, 512),
                   (512, 128), (256, 256), (256, 128)):
        spmm.EDGE_BLOCK, spmm.ROW_PANEL = eb, rp
        prop = Propagator(adj, impl="pallas")
        blocks = prop.st["panel_ids"].shape[0]
        pad = blocks * eb / max(adj.nnz, 1)
        t_f, y = chain_timer(prop, x)
        err = np.abs(np.asarray(jax.jit(prop)(x)) - y_ref).max() / scale
        t_fb, _ = chain_timer(fwd_bwd_step(prop), x)
        print(f"pallas eb={eb:5d} rp={rp:4d}: fwd {t_f*1e3:7.3f}ms "
              f"fwd+bwd {t_fb*1e3:7.3f}ms  rel_err {err:.2e} "
              f"blocks={blocks} pad_infl={pad:.2f}x", flush=True)
    spmm.EDGE_BLOCK, spmm.ROW_PANEL = 512, 256

    seg_vjp = Propagator(adj, impl="segment")
    t_f, _ = chain_timer(seg_vjp, x)
    t_fb, _ = chain_timer(fwd_bwd_step(seg_vjp), x)
    print(f"segment        : fwd {t_f*1e3:7.3f}ms fwd+bwd {t_fb*1e3:7.3f}ms")


if __name__ == "__main__":
    main()
