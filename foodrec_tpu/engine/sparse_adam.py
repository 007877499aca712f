# coding: utf-8
"""Row-sparse Adam fast path for giant embedding tables.

The reference trains the full modality tables — e.g. CIKM_Model's
`nn.Embedding.from_pretrained(v_feat, freeze=False)` copy of the ResNet
features (FoodRec/models/cikm_model.py:83-88), a dense [n_items, 2048]
parameter — while each training step only *reads* the ~2B gathered batch
rows. torch autograd materializes a dense zero-filled gradient for the
whole table and torch Adam sweeps it; the JAX port inherited the same
shape: per step, XLA writes a 245MB zero buffer, scatter-adds the batch
rows, and the fused Adam pass re-reads that mostly-zero gradient (8 full
HBM passes over table+state, measured 676 GB/s on v5e — see PARITY.md
round-3 profile).

This module removes the two dead passes (zero-init write + dense grad
read) without changing a single output bit:

  * the loss is differentiated with respect to the *gathered rows*
    (`[2B, D]`), never the dense table — the trainer gathers outside the
    autodiff boundary and the model consumes the rows (base.py
    `row_sparse_tables` / `gather_rows`);
  * the dense decay-and-update pass computes exactly what optax's
    `scale_by_adam` + `scale_by_learning_rate` chain computes for a
    zero-gradient row (the expressions below mirror
    optax/_src/transform.py::scale_by_adam and tree_utils bit for bit);
  * the touched rows are then RECOMPUTED exactly, in gathered `[K, D]`
    space, with the true per-row gradient sums, and scattered over the
    dense result. Duplicate batch rows are pre-summed in original batch
    order (stable sort + ordered segment-sum), matching XLA's in-order
    scatter-add accumulation in the dense backward.

Net effect: 6 full-table HBM passes instead of 8 and no dense gradient
buffer, with updates bit-identical to the dense optax path (modulo the
sign of floating-point zero in the first moment of never-touched rows —
`(1-b1)*(+0) + b1*(-0)` is `+0` dense and `-0` here; the parameter values
are unaffected). `tests/test_sparse_adam.py` asserts full-epoch bitwise
equality on every parameter and optimizer leaf.
"""

import jax
import jax.numpy as jnp
import optax


def supports_row_sparse(opt_state):
    """The fast path mirrors exactly one optimizer chain: scale_by_adam
    followed by scale_by_learning_rate (the `learner: adam`,
    `weight_decay: 0` configuration — the reference default). Anything
    else falls back to the dense update."""
    if not isinstance(opt_state, tuple) or len(opt_state) != 2:
        return False
    adam_st, sched_st = opt_state
    return (hasattr(adam_st, "mu") and hasattr(adam_st, "nu")
            and hasattr(adam_st, "count") and hasattr(sched_st, "count")
            and not hasattr(sched_st, "mu"))


def dedup_rows(rows, g_rows):
    """Sum duplicate row gradients in their original batch order.

    Returns (u, g_u, valid): `u[k]` is the k-th unique row id (or an
    arbitrary in-range id where `valid[k]` is False), `g_u[k]` the
    in-order sum of its duplicate gradients. The in-order accumulation
    (stable sort, then an ordered segment-sum) reproduces XLA's
    deterministic scatter-add of the dense backward bit for bit.
    """
    n = rows.shape[0]
    order = jnp.argsort(rows, stable=True)
    rs = rows[order]
    gs = g_rows[order]
    is_start = jnp.concatenate(
        [jnp.ones((1,), bool), rs[1:] != rs[:-1]])
    seg = jnp.cumsum(is_start) - 1                      # [n] sorted→segment
    g_u = jax.ops.segment_sum(gs, seg, num_segments=n,
                              indices_are_sorted=True)  # in-order sums
    # u[seg] = rs at segment starts; non-start positions dropped
    u = jnp.zeros((n,), rs.dtype).at[
        jnp.where(is_start, seg, n)].set(rs, mode="drop")
    n_unique = jnp.sum(is_start)
    valid = jnp.arange(n) < n_unique
    return u, g_u, valid


def _adam_leaf(g, mu, nu, p, *, b1, b2, eps, eps_root, count_inc,
               step_size):
    """One Adam leaf update, expression-identical to the optax chain:
    scale_by_adam (transform.py:update_fn) then scale_by_schedule's
    multiply, then optax.apply_updates' add-and-cast. `g` may be a scalar
    0.0 (the zero-gradient row case: `(1-b1)*0 + b1*mu` folds to the
    same float as optax computing it against a real zero buffer)."""
    mu2 = (1 - b1) * g + b1 * mu                 # tree_update_moment
    nu2 = (1 - b2) * (g ** 2) + b2 * nu          # ..._per_elem_norm
    # optax's own (jitted) helper, NOT an inline re-derivation: its XLA
    # module computes `m / (1 - decay**count)` with a different final
    # rounding than the eager op-by-op form (observed 1-ulp difference at
    # decay=0.999), so sharing the function is what makes the paths match
    mu_hat = optax.tree.bias_correction(mu2, b1, count_inc)
    nu_hat = optax.tree.bias_correction(nu2, b2, count_inc)
    upd = mu_hat / (jnp.sqrt(nu_hat + eps_root) + eps)
    upd = jnp.array(step_size, dtype=upd.dtype) * upd   # scale_by_schedule
    p2 = jnp.asarray(p + upd).astype(jnp.asarray(p).dtype)  # apply_updates
    return mu2, nu2, p2


def row_sparse_adam_update(table, mu, nu, rows, g_rows, *, count,
                           sched_count, lr_schedule, b1=0.9, b2=0.999,
                           eps=1e-8, eps_root=0.0):
    """Update one embedding table whose step gradient is nonzero only at
    `rows` (with duplicates), given the gradient w.r.t. the gathered rows.

    `count` is the scale_by_adam count BEFORE this step's increment;
    `sched_count` the scale_by_learning_rate count before its increment
    (optax scales by -lr(count) pre-increment). Returns (table', mu', nu').
    """
    count_inc = optax.safe_increment(count)
    step_size = -lr_schedule(sched_count)
    kw = dict(b1=b1, b2=b2, eps=eps, eps_root=eps_root,
              count_inc=count_inc, step_size=step_size)

    # one fused dense pass: decay + bias-corrected no-gradient update
    # (3 reads + 3 writes of the table-sized arrays; the dense path pays
    # 8 passes: zero-init write, scatter, and a 7-array Adam fusion)
    mu2, nu2, p2 = _adam_leaf(jnp.float32(0.0), mu, nu, table, **kw)

    # exact recompute of the touched rows in gathered space
    u, g_u, valid = dedup_rows(rows, g_rows)
    u_gather = jnp.where(valid, u, 0)
    mur, nur, pr = mu[u_gather], nu[u_gather], table[u_gather]
    mur2, nur2, pr2 = _adam_leaf(g_u, mur, nur, pr, **kw)
    u_scatter = jnp.where(valid, u, table.shape[0])     # OOB → dropped
    mu3 = mu2.at[u_scatter].set(mur2, mode="drop")
    nu3 = nu2.at[u_scatter].set(nur2, mode="drop")
    p3 = p2.at[u_scatter].set(pr2, mode="drop")
    return p3, mu3, nu3


def apply_update_row_sparse(optimizer, lr_schedule, params, opt_state,
                            grads, rows_map):
    """Split update: optax on the dense sub-tree, the fused row-sparse
    Adam on each table in `rows_map` ({param_name: row_index_array}).
    `grads[name]` for a table is the gradient w.r.t. its gathered rows.
    The returned opt_state has the exact structure optax built at init
    (table mu/nu merged back), so checkpointing and resume are unchanged.
    """
    adam_st, sched_st = opt_state
    dense = {k: v for k, v in params.items() if k not in rows_map}
    g_dense = {k: grads[k] for k in dense}
    sub_state = (
        adam_st._replace(mu={k: adam_st.mu[k] for k in dense},
                         nu={k: adam_st.nu[k] for k in dense}),
        sched_st,
    )
    updates, (adam2, sched2) = optimizer.update(g_dense, sub_state, dense)
    new_params = dict(optax.apply_updates(dense, updates))

    mu_full = dict(adam2.mu)
    nu_full = dict(adam2.nu)
    for name, rows in rows_map.items():
        p3, mu3, nu3 = row_sparse_adam_update(
            params[name], adam_st.mu[name], adam_st.nu[name], rows,
            grads[name], count=adam_st.count, sched_count=sched_st.count,
            lr_schedule=lr_schedule)
        new_params[name] = p3
        mu_full[name] = mu3
        nu_full[name] = nu3
    new_state = (adam2._replace(mu=mu_full, nu=nu_full), sched2)
    return new_params, new_state
