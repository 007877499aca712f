# coding: utf-8
"""Model contract (reference: FoodRec/common/abstract_recommender.py:8-91).

TPU-first redesign: a model is a *stateless program over a params pytree*.
Instead of nn.Module buffers, each model object holds only static/device
constants (graph propagators, feature tables, dims) built once in __init__,
and exposes pure functions the trainer jits:

    init_params(key)                  -> params pytree
    calculate_loss(params, batch)     -> tuple of scalar losses (summed for
                                         the gradient, logged per-part, like
                                         trainer.py:184-190)
    forward(params)                   -> model-specific embedding tuple (the
                                         once-per-eval graph propagation,
                                         `graph_inference_fast` semantics)
    score_candidates(params, users, cand) -> [B, C] candidate scores (the
                                         batched replacement for
                                         inference_by_user/inference_fast)

`batch` is a dict of device arrays: u_id, pos_i_id, neg_i_id (+ a float
`weight` mask for the padded tail of the last batch). Models gather their own
side features (image/text/ingredients/levels) from device tables — the
reference pre-gathers them per-sample on host (dataloader.py:30-38).
"""

import contextlib

import jax.numpy as jnp
import numpy as np


class GeneralRecommender:
    def __init__(self, config, dataset):
        self.config = config
        self.dataset = dataset
        self.dd = dataset.device_data  # DeviceData, attached by quick_start
        self.n_users = dataset.n_users
        self.n_items = dataset.n_items
        self.embedding_size = config["embedding_size"]
        self._buffers = {}

        # modality features (abstract_recommender.py:84-91). Kept HOST-side
        # (numpy): most models only read them once in init_params (they
        # become trainable params); models that score with them register a
        # device buffer themselves (e.g. LightGCN's feat). This keeps the
        # raw 2048-d table out of HBM — 2.4GB at the Foodcom-XL catalog.
        self.v_feat = None
        self.t_feat = None
        if config["is_multimodal_model"] and not config["end2end"]:
            self.v_feat = np.asarray(self.dd.img, dtype=np.float32)
            self.t_feat = np.asarray(self.dd.txt, dtype=np.float32)

    # -- constant buffers ------------------------------------------------------
    # JAX inlines device arrays captured by closure into the HLO as dense
    # literals, so every compile would ship the graph tables / feature
    # matrices / bitmaps in the program payload (hundreds of MB at Foodcom+
    # scale; the tunnel compiler rejects them outright at Allrecipes scale).
    # Models therefore *register* every large constant; the trainer passes
    # `model.buffers` through jit as an argument and re-binds the tracers
    # during tracing via `bind()`, keeping the compiled program free of
    # literals while model code keeps reading plain attributes.

    def register_buffer(self, name, value):
        self._buffers[name] = value
        setattr(self, name, value)
        return value

    def register_propagator(self, name, prop):
        self._buffers[name] = prop
        setattr(self, name, prop)
        return prop

    @property
    def buffers(self):
        """Pytree of all registered constants (propagators contribute their
        edge-array state)."""
        from foodrec_tpu.ops.spmm import Propagator

        out = {}
        for n, v in self._buffers.items():
            out[n] = v.state if isinstance(v, Propagator) else v
        return out

    @contextlib.contextmanager
    def bind(self, buffers):
        """Temporarily swap registered constants for `buffers` (typically
        jit tracers) while tracing a computation."""
        from foodrec_tpu.ops.spmm import Propagator

        saved = {}
        for n, v in buffers.items():
            target = self._buffers[n]
            if isinstance(target, Propagator):
                saved[n] = target.state
                target.bind_state(v)
            else:
                saved[n] = getattr(self, n)
                setattr(self, n, v)
        try:
            yield
        finally:
            for n, v in saved.items():
                target = self._buffers[n]
                if isinstance(target, Propagator):
                    target.bind_state(v)
                else:
                    setattr(self, n, v)

    # -- row-sparse table contract --------------------------------------------
    def row_sparse_tables(self, batch):
        """Parameter tables whose per-step gradient is nonzero only at a
        known row set: {param_name: row_index_array}. The trainer gathers
        those rows OUTSIDE autodiff, differentiates the loss w.r.t. the
        gathered `[K, D]` rows, and applies the fused row-sparse Adam
        update (engine/sparse_adam.py) — skipping the dense zero-filled
        gradient buffer the torch reference materializes for its
        `from_pretrained(..., freeze=False)` modality tables. Models that
        opt in must read those tables through `gather_rows` in
        calculate_loss. Default: no tables (dense path)."""
        return {}

    @staticmethod
    def gather_rows(params, batch, name, idx):
        """`params[name][idx]` — unless the trainer pre-gathered this
        table's rows (row-sparse fast path), in which case `params[name]`
        IS the gathered `[K, D]` rows for exactly this `idx`."""
        if batch.get("_row_sparse"):
            return params[name]
        return params[name][idx]

    # -- contract ------------------------------------------------------------
    def init_params(self, key):
        raise NotImplementedError

    def calculate_loss(self, params, batch):
        raise NotImplementedError

    def forward(self, params):
        raise NotImplementedError

    def score_candidates(self, params, users, cand):
        """Default: dot-product of propagated user/item embeddings."""
        return self.score_from_cache(params, self.eval_cache(params),
                                     users, cand)

    # Evaluation splits the reference's two inference paths
    # (inference_by_user vs inference_fast + one-shot forward,
    # trainer.py:235-246) into: eval_cache() computed ONCE per evaluation,
    # then score_from_cache() per user block.
    def eval_cache(self, params):
        return self.forward(params)[:2]

    def score_from_cache(self, params, cache, users, cand):
        user_emb, item_emb = cache[:2]
        return jnp.einsum("bd,bcd->bc", user_emb[users], item_emb[cand])

    def diagnostic_embeddings(self, tree):
        """Same-dim (id, text, image) embedding matrices for the cosine
        probe (reference trainer.py:584-629 reads model.id_emb / text_emb /
        image_emb — attributes only unshipped variants set; on the six
        shipped models the flag would crash there). Works on the params
        pytree and, since grads share its structure, on grads.

        Returns None unless all three tables exist with one trailing dim —
        the trainer then skips the probe instead of crashing.
        """
        keys = ("item_embedding", "text_embedding", "image_embedding")
        if not all(isinstance(tree, dict) and k in tree for k in keys):
            return None
        mats = [tree[k] for k in keys]
        if len({m.shape[-1] for m in mats}) != 1:
            return None
        return tuple(mats)

    # -- sharding -------------------------------------------------------------
    def param_shardings(self, mesh, params):
        """NamedSharding per param for a mesh with optional 'model' axis.

        Default policy: replicate everything; shard the large modality
        feature tables (image/text embeddings, dim >= 512) row-wise over
        'model' — they dominate memory (n_items x 2048 floats) and their
        per-step gradient is a batch-row scatter that parallelizes cleanly.
        """
        import jax
        from jax.sharding import NamedSharding, PartitionSpec as P

        rep = NamedSharding(mesh, P())
        has_model = "model" in mesh.shape and mesh.shape["model"] > 1

        def rule(path, leaf):
            name = "/".join(str(getattr(p, "key", p)) for p in path)
            if (has_model and leaf.ndim == 2 and leaf.shape[1] >= 512
                    and leaf.shape[0] % mesh.shape["model"] == 0
                    and "embedding" in name):
                return NamedSharding(mesh, P("model", None))
            return rep

        return jax.tree_util.tree_map_with_path(rule, params)

    # -- conveniences --------------------------------------------------------
    def pre_epoch_processing(self, params):
        return params

    def post_epoch_processing(self, params):
        return params

    def num_parameters(self, params):
        import jax

        return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))

    def __str__(self):
        return self.__class__.__name__
