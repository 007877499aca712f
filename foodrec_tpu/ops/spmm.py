# coding: utf-8
"""TPU-native SpMM: y = A @ x for a normalized sparse adjacency A.

Replaces every `torch.sparse.mm` propagation loop in the reference
(FoodRec/models/lightgcn.py:139, cikm_model.py:187/199, pricai_modelx.py:183+,
bm3.py:93, fgcn.py:155/244, and torch_geometric GCNConv in schgn.py:34-39).

Three implementations behind one Propagator interface:

  * `ell`      — padded neighbour-table gather: y[n] = sum_k vals[n,k] * x[cols[n,k]].
                 Best when max degree is bounded (ingredient/cluster graphs,
                 degree <= 20).
  * `segment`  — sorted-COO gather + jax.ops.segment_sum. General fallback.
  * `pallas`   — MXU weighted-one-hot reduction: edge activations are
                 pre-gathered by XLA (one pure-gather pass), then a Pallas
                 kernel reduces each row-panel with dense [E_BLK, PANEL]
                 selection matmuls that carry the adjacency values, instead
                 of scatter-adds. Scatter is the slow path on TPU; trading it
                 for MXU FLOPs is the idiomatic win. The grid is flat over
                 occupied edge blocks (scalar-prefetched block->panel map), so
                 power-law hub rows don't inflate idle grid steps.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from foodrec_tpu.ops.graph import NormalizedAdjacency

# ---------------------------------------------------------------------------
# Reference implementations (XLA)
# ---------------------------------------------------------------------------


def spmm_coo(rows, cols, vals, x, n_rows):
    """Sorted-COO SpMM via gather + segment_sum."""
    contrib = x[cols] * vals[:, None]
    return jax.ops.segment_sum(
        contrib, rows, num_segments=n_rows, indices_are_sorted=True)


def spmm_ell(ell_cols, ell_vals, x):
    """Padded neighbour-table SpMM: [N, K] gather + weighted reduction."""
    gathered = x[ell_cols]                      # [N, K, D]
    return jnp.einsum("nk,nkd->nd", ell_vals, gathered,
                      preferred_element_type=jnp.float32)


# ---------------------------------------------------------------------------
# Pallas one-hot-matmul reduction
# ---------------------------------------------------------------------------

EDGE_BLOCK = 512   # edges per kernel step
ROW_PANEL = 128    # output rows per panel (one-hot matmul N dimension)
# Geometry from on-device sweeps (tools/spmm_microbench.py) at BOTH real
# operating points: (512,128) is fastest everywhere — Foodcom ui 190k
# edges (beats 512/256 by 2.3%), Allrecipes ui 677k edges (12.08 vs
# 13.91ms fwd+bwd, -13%) and Allrecipes ri 395k edges (7.50 vs 7.70ms).
# Smaller panels cost more blocks (pad_infl 1.18x vs 1.06x at 677k) but
# each one-hot matmul is [eb,rp]x[eb,d] -> the rp=128 selection matrix
# halves MXU N-dim padding waste and the panel output fits one (8,128)
# vreg column, which wins despite the extra blocks.

# MXU pass-count strategy for the f32 selection matmul. "highest" = Mosaic's
# full f32 emulation; "3pass" = manual bf16 hi/lo split keeping the three
# leading cross terms (Mosaic has no native HIGH lowering). Measured on the
# Foodcom-shaped graph (tools/spmm_microbench.py): fwd 3.27/3.14/3.10ms for
# highest/3pass/default — the kernel is DMA/grid-bound, not MXU-bound, so
# the full-precision passes are effectively free. Keep "highest".
MXU_PRECISION = "highest"


def _dot_rowsum(sel, x, precision):
    """sel^T @ x with a selectable f32 emulation strategy (see MXU_PRECISION)."""
    dn = (((0,), (0,)), ((), ()))
    if precision == "3pass":
        s_hi = sel.astype(jnp.bfloat16)
        s_lo = (sel - s_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        x_hi = x.astype(jnp.bfloat16)
        x_lo = (x - x_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        kw = dict(dimension_numbers=dn,
                  preferred_element_type=jnp.float32)
        return (jax.lax.dot_general(s_hi, x_hi, **kw)
                + jax.lax.dot_general(s_hi, x_lo, **kw)
                + jax.lax.dot_general(s_lo, x_hi, **kw))
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    return jax.lax.dot_general(sel, x, dimension_numbers=dn,
                               preferred_element_type=jnp.float32,
                               precision=prec)


def _panelize(rows, n_rows, edge_block=None, row_panel=None):
    """Repartition sorted edges so no EDGE_BLOCK spans two row panels.

    Returns (edge_perm, panel_ids) where edge_perm indexes (with -1 padding)
    into the original edge arrays and panel_ids[b] is the output row-panel of
    edge block b. The grid is FLAT over occupied blocks — power-law degree
    distributions make a dense (panel, max_blocks_per_panel) grid mostly idle
    (the hub panel sets max_blocks; measured ~5x wasted DMA steps on the
    Foodcom ui/ri graphs), so each block instead carries its own panel id as
    a scalar-prefetch lookup. Empty panels still get one all-padding block so
    their output rows are zero-initialized.
    """
    eb = edge_block or EDGE_BLOCK
    rp = row_panel or ROW_PANEL
    n_panels = -(-n_rows // rp)
    panel_of_edge = rows // rp
    counts = np.bincount(panel_of_edge, minlength=n_panels)
    blocks = -(-counts // eb)
    blocks = np.maximum(blocks, 1)
    starts = np.concatenate([[0], np.cumsum(blocks)[:-1]])
    total_blocks = int(blocks.sum())

    perm = np.full(total_blocks * eb, -1, dtype=np.int64)
    edge_starts = np.concatenate([[0], np.cumsum(counts)[:-1]])
    for p in range(n_panels):
        s = starts[p] * eb
        perm[s:s + counts[p]] = np.arange(edge_starts[p],
                                          edge_starts[p] + counts[p])
    panel_ids = np.repeat(np.arange(n_panels, dtype=np.int32), blocks)
    return perm, panel_ids


def _spmm_pallas_kernel(panel_ref, lrow_ref, val_ref, xg_ref, out_ref,
                        *, precision, edge_block, row_panel):
    j = pl.program_id(0)
    p = panel_ref[j]
    prev = jnp.where(j == 0, -1, panel_ref[jnp.maximum(j - 1, 0)])

    @pl.when(p != prev)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    # weighted one-hot: row-selection matrix carrying the adjacency values,
    # so the edge scaling rides the MXU pass instead of a separate HBM
    # read-modify-write over the gathered activations
    lrows = lrow_ref[:]  # [E_BLK, 1] local row ids (or -1 padding)
    sel = jnp.where(
        lrows == jax.lax.broadcasted_iota(
            jnp.int32, (edge_block, row_panel), 1),
        val_ref[:], jnp.float32(0.0))
    # the adjacency values must not round to a single bf16 pass or
    # propagation drifts from the reference normalization; pass count
    # (full f32 vs 3-pass bf16) is configured via MXU_PRECISION
    out_ref[:] += _dot_rowsum(sel, xg_ref[:], precision)


def _interpret_mode():
    # pallas TPU kernels only run compiled on TPU; tests on the virtual CPU
    # mesh fall back to the interpreter
    return jax.default_backend() != "tpu"


@functools.partial(jax.jit, static_argnames=("n_rows", "precision",
                                             "edge_block", "row_panel"))
def _spmm_pallas_call(local_rows, vals, panel_ids, xg, n_rows,
                      precision=None, edge_block=None, row_panel=None):
    eb = edge_block or EDGE_BLOCK
    rp = row_panel or ROW_PANEL
    n_panels = -(-n_rows // rp)
    total_blocks = panel_ids.shape[0]
    d = xg.shape[-1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(total_blocks,),
        in_specs=[
            pl.BlockSpec((eb, 1),
                         lambda j, panel: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((eb, 1),
                         lambda j, panel: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((eb, d),
                         lambda j, panel: (j, 0),
                         memory_space=pltpu.VMEM),
        ],
        # consecutive blocks of one panel revisit the same out block; Mosaic
        # keeps it resident in VMEM and writes back on the panel switch
        out_specs=pl.BlockSpec((rp, d),
                               lambda j, panel: (panel[j], 0),
                               memory_space=pltpu.VMEM),
    )
    if precision is None:
        precision = MXU_PRECISION
    out = pl.pallas_call(
        functools.partial(_spmm_pallas_kernel, precision=precision,
                          edge_block=eb, row_panel=rp),
        grid_spec=grid_spec,
        interpret=_interpret_mode(),
        out_shape=jax.ShapeDtypeStruct((n_panels * rp, d), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=2 * local_rows.shape[0] * rp * d,
            bytes_accessed=xg.size * 4 + n_panels * rp * d * 4,
            transcendentals=0,
        ),
    )(panel_ids, local_rows, vals, xg)
    return out[:n_rows]


class Propagator:
    """y = A @ x with a chosen implementation.

    Construct once per graph on the host. The edge arrays live in `self.st`
    (a dict pytree) so callers can thread them through jit as *arguments*:
    JAX inlines closed-over device arrays into the HLO as dense literals,
    which at Foodcom/Allrecipes scale blew compile payloads past the remote
    compiler's limits — see models/base.py bind(). `__call__` reads whatever
    is currently bound in `self.st` at trace time.

    Differentiation: XLA's autodiff of the gather-based forward emits a
    1M+-row scatter-add, which is the slowest op on TPU. `__call__` therefore
    carries a custom VJP: d/dx (A @ x) = A^T @ g — just another gather-SpMM
    with the transposed adjacency (A itself when symmetric). This turned out
    to be the single largest train-step win at Foodcom scale (~2.5x on the
    backward pass of every propagation hop).
    """

    def __init__(self, adj: NormalizedAdjacency, impl="auto",
                 compute_dtype=None, _with_vjp=True):
        self.n_nodes = adj.n_nodes
        self.adj = adj  # host-side; lets bench/gates rebuild impl variants
        # 'bfloat16' halves gather traffic on the edge-gathered activations
        # (~15% per hop measured at Foodcom scale); accumulation stays f32.
        # Default f32 keeps bit-parity with the reference normalization.
        self.compute_dtype = (jnp.bfloat16 if str(compute_dtype) == "bfloat16"
                              else None)
        # captured at construction so each Propagator owns its pass count
        # and block geometry (module globals read once; static jit args
        # downstream — tools/spmm_microbench.py sweeps them)
        self.mxu_precision = MXU_PRECISION
        self.edge_block = EDGE_BLOCK
        self.row_panel = ROW_PANEL
        if impl == "auto":
            # ELL reads n_nodes*max_degree padded slots; only worth it when
            # padding inflation is small. Otherwise the pallas kernel (exact
            # nnz gathers + MXU one-hot reduce) wins on TPU; on CPU pallas
            # only runs interpreted, so fall back to segment_sum.
            ell_ok = (adj.has_ell
                      and adj.n_nodes * adj.max_degree <= 1.5 * max(adj.nnz, 1))
            if ell_ok:
                impl = "ell"
            elif jax.default_backend() == "tpu" and adj.nnz > 0:
                impl = "pallas"
            else:
                impl = "segment"
        if impl == "ell" and not adj.has_ell:
            impl = "segment"
        self.impl = impl

        if _with_vjp:
            from foodrec_tpu.ops.graph import transpose_adjacency

            self._t_prop = (self if adj.symmetric else
                            Propagator(transpose_adjacency(adj), impl,
                                       compute_dtype=compute_dtype,
                                       _with_vjp=False))

            @jax.custom_vjp
            def _apply(x):
                return self._raw(x)

            def _fwd(x):
                return self._raw(x), None

            def _bwd(_, g):
                return (self._t_prop._raw(g),)

            _apply.defvjp(_fwd, _bwd)
            self._apply = _apply
        else:
            self._apply = self._raw

        if impl == "ell":
            self.st = {"ell_cols": jnp.asarray(adj.ell_cols),
                       "ell_vals": jnp.asarray(adj.ell_vals)}
        elif impl == "segment":
            self.st = {"rows": jnp.asarray(adj.rows),
                       "cols": jnp.asarray(adj.cols),
                       "vals": jnp.asarray(adj.vals)}
        elif impl == "pallas":
            perm, panel_ids = _panelize(adj.rows, adj.n_nodes,
                                        self.edge_block, self.row_panel)
            safe = np.maximum(perm, 0)
            cols_p = adj.cols[safe].astype(np.int64)
            vals_p = np.where(perm >= 0, adj.vals[safe], 0.0).astype(np.float32)
            lrows = np.where(perm >= 0, adj.rows[safe] % self.row_panel, -1)
            self.st = {
                "cols_p": jnp.asarray(cols_p),
                "vals_p": jnp.asarray(vals_p.reshape(-1, 1)),
                "local_rows": jnp.asarray(lrows.astype(np.int32).reshape(-1, 1)),
                "panel_ids": jnp.asarray(panel_ids),
            }
        else:
            raise ValueError(f"unknown spmm impl: {impl}")

    @property
    def state(self):
        """All device arrays, own + transpose: pass through jit and bind()."""
        st = {"own": self.st}
        if getattr(self, "_t_prop", None) is not None \
                and self._t_prop is not self:
            st["transpose"] = self._t_prop.st
        return st

    def bind_state(self, state):
        self.st = state["own"]
        if "transpose" in state:
            self._t_prop.st = state["transpose"]

    def _raw(self, x):
        st = self.st
        dt = self.compute_dtype
        xc = x.astype(dt) if dt is not None else x
        if self.impl == "ell":
            vals = st["ell_vals"].astype(dt) if dt is not None else st["ell_vals"]
            return spmm_ell(st["ell_cols"], vals, xc)
        if self.impl == "segment":
            vals = st["vals"].astype(dt) if dt is not None else st["vals"]
            # undo a possible bf16 compute_dtype but keep f64 inputs f64
            # (the x64 gradient-certificate path runs this impl on CPU)
            return spmm_coo(st["rows"], st["cols"], vals, xc,
                            self.n_nodes).astype(x.dtype)
        # pallas: XLA does only the row gather; the edge scaling is folded
        # into the kernel's selection matrix (one HBM pass instead of two)
        xg = xc[st["cols_p"]]
        return _spmm_pallas_call(st["local_rows"], st["vals_p"],
                                 st["panel_ids"], xg.astype(jnp.float32),
                                 self.n_nodes,
                                 precision=self.mxu_precision,
                                 edge_block=self.edge_block,
                                 row_panel=self.row_panel)

    def __call__(self, x):
        return self._apply(x)


def propagate_mean(propagator, x0, n_layers):
    """Repeated propagation with layer-mean readout — the shared GCN recipe
    (reference: lightgcn.py:134-147). Uses a statically unrolled loop (tiny
    n_layers) so XLA can fuse each hop."""
    acc = x0
    x = x0
    for _ in range(n_layers):
        x = propagator(x)
        acc = acc + x
    return acc / (n_layers + 1)
