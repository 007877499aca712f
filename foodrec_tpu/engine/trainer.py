# coding: utf-8
"""Trainer: fit / evaluate with the reference's control flow
(FoodRec/common/trainer.py:87-503) on a TPU-native execution model.

Reference hot loop: torch DataLoader feeds host-sampled batches, one
optimizer step per batch (trainer.py:156-229). Here the *entire epoch* is one
jit-compiled `lax.scan`: a device PRNG permutes the interaction list, draws
rejection-sampled negatives on-chip (data/sampling.py), and runs n_batches
fused train steps without touching the host.

Semantics preserved:
  * optimizer zoo adam/sgd/adagrad/rmsprop with torch-style L2 weight_decay
    (trainer.py:137-154)
  * LambdaLR epoch schedule lr * s0 ** (epoch / s1) (trainer.py:121-125)
  * loss tuples summed for the gradient, accumulated per-part for logging
    (trainer.py:184-190); NaN-loss abort (trainer.py:191-193)
  * Mirror Gradient: every beta-th batch steps on alpha1*loss then applies
    -alpha2*loss on the replayed batch (trainer.py:195-211)
  * eval every eval_step epochs, early stopping on valid_metric with
    patience `stopping_step` (trainer.py:428-440; utils.py:56-97)
  * best-on-valid checkpointing, best params restored for the final test
    (trainer.py:449-473)

The padded tail of the last batch wraps around to the head of the epoch
permutation (static shapes for XLA) and is weighted out of the loss means via
batch['weight'].
"""

import functools
import logging
import os
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from foodrec_tpu.data.sampling import sample_negatives
from foodrec_tpu.engine.evaluator import by_user_metrics, evaluate_by_user
from foodrec_tpu.engine.sparse_adam import (
    apply_update_row_sparse,
    supports_row_sparse,
)
from foodrec_tpu.utils.misc import dict2str, early_stopping


def build_optimizer(learner, lr_schedule, weight_decay):
    """torch-parity optimizer chain: L2-in-gradient weight decay, then the
    chosen update rule (trainer.py:137-154)."""
    learner = (learner or "adam").lower()
    txs = []
    if weight_decay:
        txs.append(optax.add_decayed_weights(weight_decay))
    if learner == "adam":
        txs.append(optax.scale_by_adam(eps=1e-8))
    elif learner == "sgd":
        pass  # plain gradient
    elif learner == "adagrad":
        txs.append(optax.scale_by_rss(initial_accumulator_value=0.0, eps=1e-10))
    elif learner == "rmsprop":
        txs.append(optax.scale_by_rms(decay=0.99, eps=1e-8))
    else:
        logging.getLogger().warning(
            "Received unrecognized optimizer, set default Adam optimizer")
        txs.append(optax.scale_by_adam(eps=1e-8))
    txs.append(optax.scale_by_learning_rate(lr_schedule))
    return optax.chain(*txs)


class Trainer:
    def __init__(self, config, model, mg=False):
        self.config = config
        self.model = model
        self.logger = logging.getLogger()
        self.learner = config["learner"]
        self.learning_rate = config["learning_rate"]
        self.epochs = config["epochs"]
        self.eval_step = min(config["eval_step"], self.epochs)
        self.stopping_step = config["stopping_step"]
        self.clip_grad_norm = config["clip_grad_norm"]
        self.valid_metric_bigger = config["valid_metric_bigger"]
        self.eval_batch_size = config["eval_batch_size"]
        self.neg_sample_num = config["neg_sample_num"]
        wd = config["weight_decay"] or 0.0
        # string weight_decay is eval'd in the reference (trainer.py:102-105)
        self.weight_decay = float(eval(wd)) if isinstance(wd, str) else wd
        self.req_training = config["req_training"]
        self.mg = mg
        self.alpha1 = config["alpha1"]
        self.alpha2 = config["alpha2"]
        self.beta = config["beta"]

        self.train_batch_size = config["train_batch_size"]
        dd = model.dd
        self.n_train = dd.n_train
        self.n_batches = -(-self.n_train // self.train_batch_size)
        sched = config["learning_rate_scheduler"] or [1.0, 50]
        n_batches = self.n_batches
        lr0 = self.learning_rate

        def lr_schedule(step):
            epoch = step // n_batches
            return lr0 * sched[0] ** (epoch / sched[1])

        self.lr_schedule = lr_schedule
        self.optimizer = build_optimizer(self.learner, lr_schedule,
                                         self.weight_decay)

        # optional device mesh (config['mesh_shape'], parallel/mesh.py)
        from foodrec_tpu.parallel.mesh import make_mesh

        self.mesh = make_mesh(config["mesh_shape"])

        self._train_u = jnp.asarray(dd.train_u)
        self._train_i = jnp.asarray(dd.train_i)
        self._excl = jnp.asarray(dd.excl_bitmap)
        # large constants are threaded through jit as ARGUMENTS — closure
        # capture would inline them into the HLO as dense literals (see
        # models/base.py bind())
        self._buffers = model.buffers
        self._epoch_fn_inner = self._build_epoch_fn()
        self._cache_fn_inner = jax.jit(self._bound(model.eval_cache))
        self._score_fn_inner = jax.jit(self._bound(model.score_from_cache))

        neg_num = self.neg_sample_num

        def _eval_block(buffers, params, cache, users, cand, n_pos, n_cand):
            with model.bind(buffers):
                scores = model.score_from_cache(params, cache, users, cand)
            return scores, by_user_metrics(scores, n_pos, n_cand,
                                           neg_num=neg_num)

        # stable jit: retracing a per-eval closure cost seconds per eval
        self._eval_block_fn = jax.jit(_eval_block)

        self.best_valid_score = -1.0
        self.best_valid_result = None
        self.train_loss_dict = {}
        self._epoch_cos_sim = None  # calcu_cos_similarity epoch accumulator

    def _bound(self, fn):
        """Wrap `fn` so registered model buffers arrive as the first jit
        argument and are re-bound during tracing."""
        model = self.model

        def wrapped(buffers, *args):
            with model.bind(buffers):
                return fn(*args)

        return wrapped

    def _epoch_fn(self, params, opt_state, key):
        return self._epoch_fn_inner(params, opt_state, key, self._buffers,
                                    self._train_u, self._train_i, self._excl)

    def _cache_fn(self, params):
        return self._cache_fn_inner(self._buffers, params)

    def _score_fn(self, params, cache, users, cand):
        return self._score_fn_inner(self._buffers, params, cache, users, cand)

    # ------------------------------------------------------------------ train
    def _build_epoch_fn(self):
        model = self.model
        optimizer = self.optimizer
        bs = self.train_batch_size
        n_batches = self.n_batches
        n_train = self.n_train
        clip = self.clip_grad_norm
        mg = self.mg
        alpha1, alpha2, beta = self.alpha1, self.alpha2, self.beta

        def loss_and_parts(params, batch):
            losses = model.calculate_loss(params, batch)
            if not isinstance(losses, tuple):
                losses = (losses,)
            total = sum(losses)
            return total, jnp.stack([jnp.asarray(l) for l in losses])

        grad_fn = jax.value_and_grad(loss_and_parts, has_aux=True)

        def apply_update(params, opt_state, grads):
            if clip:
                gnorm = optax.global_norm(grads)
                max_norm = clip.get("max_norm", 1.0)
                scale = jnp.minimum(1.0, max_norm / (gnorm + 1e-6))
                grads = jax.tree.map(lambda g: g * scale, grads)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, opt_state

        n_tries = self.config["neg_sample_tries"] or 32
        num_items = model.dd.num_items

        # health-stratified second negative (reference dataloader.py:87-114
        # emits health_neg* fields when `health_neg_sample` is set); the
        # bucket arrays are small (<1MB) so closure capture is fine
        hns = bool(self.config["health_neg_sample"])
        if hns:
            from foodrec_tpu.data.sampling import (
                sample_health_stratified_negatives)

            ddh = model.dd
            assert ddh.health_bucket_items is not None, (
                "health_neg_sample set but DeviceData has no bucket arrays")
            h_level = jnp.asarray(ddh.health_level)
            h_bucket = jnp.asarray(ddh.health_bucket_items)
            h_in_set = jnp.asarray(ddh.health_in_sample)
            h_train_items = jnp.asarray(ddh.train_items_arr)

        # per-batch embedding/grad cosine probe, accumulated over the epoch
        # like the reference's total_sim (trainer.py:216-220)
        probe_on = bool(self.config["calcu_cos_similarity"])
        # row-sparse table fast path (engine/sparse_adam.py): bit-exact with
        # the dense update (tests/test_sparse_adam.py + TPU check in
        # tools/verify_sparse_adam_tpu.py), so enabling is purely a traffic
        # decision. It trades two full-table HBM passes (zero-init write +
        # dense grad read) for per-row gathers/scatters whose (8,128)-tile
        # read-modify-write amplification is batch-proportional: measured
        # NEUTRAL at Foodcom scale (29,943x2048 table, 1024 batch rows,
        # 6.88 vs 6.79s epoch) and a win only when the catalog dwarfs the
        # batch. 'auto' (None) therefore enables per table at
        # n_rows > 64 x batch_rows (~2x the measured break-even).
        # MG replays grads tree-wide, clip needs the dense global norm, and
        # the cosine probe reads dense table grads — all three force the
        # dense path. True/False force the choice for every table.
        rs_cfg = self.config["row_sparse_table_update"]
        rs_auto = rs_cfg is None or rs_cfg == "auto"
        row_sparse_on = ((rs_auto or bool(rs_cfg)) and not mg
                         and not clip and not probe_on
                         and not self.weight_decay)

        def rs_filter(params, rows_map):
            if not rs_auto:
                return rows_map
            return {n: r for n, r in rows_map.items()
                    if params[n].shape[0] > 64 * r.shape[0]}

        lr_schedule = self.lr_schedule
        if probe_on:
            from foodrec_tpu.utils.diagnostics import embedding_cos_similarity
        # chunk the per-epoch scan: K steps per jit call, host loop over
        # chunks (bounds compile-unit size; semantics identical because the
        # final ragged chunk is compiled at its exact step count)
        chunk = self.config["epoch_scan_chunk"]
        chunk = n_batches if not chunk else min(int(chunk), n_batches)
        n_chunks = -(-n_batches // chunk)

        # rem > 0 → the last batch of the epoch runs at its EXACT size
        # (reference DataLoader semantics: the final batch is smaller, not
        # cyclically padded). Padding with zero sample-weight is exact for
        # per-sample losses but NOT for batch-statistics losses (PRICAI's
        # dCor computes pairwise distances over the whole batch —
        # wrap-around duplicates bias it). Under a mesh, when the remainder
        # doesn't divide the 'data' axis, shard_batch (parallel/mesh.py)
        # falls back to full replication for the tail step — semantics stay
        # exact; only that one step runs replicated instead of sharded.
        rem = n_train - (n_batches - 1) * bs
        exact = self.config["exact_final_batch"]
        exact_tail = 0 < rem < bs and (exact or exact is None)

        def make_train_step(step_bs):
          def train_step(carry, batch_idx):
            params, opt_state, perm, k_steps, train_u, train_i, excl = carry
            key = jax.random.fold_in(k_steps, batch_idx)
            start = batch_idx * bs
            idx = jax.lax.dynamic_slice_in_dim(perm, start, step_bs)
            weight = (start + jnp.arange(step_bs)) < n_train
            u = train_u[idx]
            i = train_i[idx]
            k_neg, k_model = jax.random.split(key)
            neg = sample_negatives(k_neg, u, excl, num_items,
                                   n_tries=n_tries)
            batch = {"u_id": u, "pos_i_id": i, "neg_i_id": neg,
                     "weight": weight.astype(jnp.float32),
                     "key": k_model}
            if hns:
                batch["health_neg"] = sample_health_stratified_negatives(
                    jax.random.fold_in(k_neg, 1), u, i, excl, h_level,
                    h_bucket, h_in_set, h_train_items, n_tries=n_tries)
            if self.mesh is not None:
                from foodrec_tpu.parallel.mesh import shard_batch

                batch = shard_batch(self.mesh, batch)

            rows_map = (rs_filter(params, model.row_sparse_tables(batch))
                        if row_sparse_on else {})
            if rows_map and isinstance(params, dict) \
                    and supports_row_sparse(opt_state):
                # differentiate w.r.t. the gathered rows, never the dense
                # tables: no zero-filled table-sized gradient buffer
                pv = dict(params)
                for n, r in rows_map.items():
                    pv[n] = params[n][r]
                (total, parts), grads = grad_fn(
                    pv, {**batch, "_row_sparse": True})
                new_params, new_opt = apply_update_row_sparse(
                    optimizer, lr_schedule, params, opt_state, grads,
                    rows_map)
                return (new_params, new_opt, perm, k_steps,
                        train_u, train_i, excl), parts

            (total, parts), grads = grad_fn(params, batch)

            if mg:
                def mg_update(args):
                    params, opt_state = args
                    g1 = jax.tree.map(lambda g: alpha1 * g, grads)
                    params1, opt_state1 = apply_update(params, opt_state, g1)
                    # replay the same batch at the new params
                    (_, _), grads2 = grad_fn(params1, batch)
                    g2 = jax.tree.map(lambda g: -alpha2 * g, grads2)
                    return apply_update(params1, opt_state1, g2)

                def plain_update(args):
                    params, opt_state = args
                    return apply_update(params, opt_state, grads)

                new_params, new_opt = jax.lax.cond(
                    batch_idx % beta == 0, mg_update, plain_update,
                    (params, opt_state))
            else:
                new_params, new_opt = apply_update(params, opt_state, grads)

            out = parts
            if probe_on:
                emb = model.diagnostic_embeddings(new_params)
                if emb is not None:
                    gemb = model.diagnostic_embeddings(grads)
                    sim = jnp.stack(embedding_cos_similarity(*emb, *gemb))
                else:
                    sim = jnp.zeros((6,), jnp.float32)
                out = (parts, sim)
            return (new_params, new_opt, perm, k_steps,
                    train_u, train_i, excl), out
          return train_step

        train_step = make_train_step(bs)
        tail_step = make_train_step(rem) if exact_tail else None

        @jax.jit
        def perm_fn(key):
            perm = jax.random.permutation(key, n_train)
            if exact_tail:
                # exact coverage: every scan/tail slice stays in-bounds
                return perm.astype(jnp.int32)
            # cyclic pad to the scan length; padded positions carry zero
            # sample weight so only the true n_train samples contribute
            return jnp.resize(perm, n_batches * bs).astype(jnp.int32)

        # donate params/opt_state: the epoch loop reassigns them, and without
        # donation the XL-catalog adam state (A~10GB) double-buffers past HBM
        # The final ragged chunk is compiled at its EXACT length (second jit
        # variant) instead of masking overflow steps with a jnp.where over
        # every param/opt leaf — that where was a full optimizer-state HBM
        # sweep per step (~16% of the CIKM Foodcom epoch, see PARITY.md).
        def make_chunk_fn(length):
            @functools.partial(jax.jit, donate_argnums=(0, 1))
            def chunk_fn(params, opt_state, perm, k_steps, start, buffers,
                         train_u, train_i, excl):
                with model.bind(buffers):
                    # fresh body-fn object per trace: lax.scan caches the body
                    # jaxpr by (function identity, per-step avals) — identical
                    # across the two chunk-length variants — and the cached
                    # jaxpr's constants are THIS trace's bound-buffer tracers,
                    # which must not leak into the other variant's trace
                    carry = (params, opt_state, perm, k_steps, train_u,
                             train_i, excl)
                    carry, out = jax.lax.scan(
                        lambda c, b: train_step(c, b),
                        carry, start + jnp.arange(length))
                    out = jax.tree.map(lambda x: jnp.sum(x, axis=0), out)
                return carry[0], carry[1], out
            return chunk_fn

        # the exact-size remainder batch runs in its OWN small executable:
        # inlining it into the last chunk traced the full train step TWICE
        # in one compile unit, nearly doubling the cold TPU compile of the
        # dominant executable (r2 bench: 200.9s warmup; VERDICT r2 weak #5)
        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def tail_fn(params, opt_state, perm, k_steps, buffers,
                    train_u, train_i, excl):
            with model.bind(buffers):
                carry = (params, opt_state, perm, k_steps, train_u,
                         train_i, excl)
                carry, out = tail_step(carry, jnp.int32(n_batches - 1))
            return carry[0], carry[1], out

        chunk_fns = {}
        chunk_lens = [chunk] * (n_chunks - 1)
        chunk_lens.append(n_batches - chunk * (n_chunks - 1) -
                          (1 if exact_tail else 0))
        precompile_state = {"pending": True}
        # diagnostics handles (tools/attr_fusions.py lowers these to HLO)
        self._chunk_fns = chunk_fns
        self._chunk_lens = chunk_lens
        self._make_chunk_fn = make_chunk_fn
        self._tail_fn_handle = tail_fn if exact_tail else None

        def precompile_parallel(params, opt_state, perm, k_steps, buffers,
                                train_u, train_i, excl):
            """Overlap the cold XLA compiles of the epoch's executables.

            A cold epoch pays compile(scan chunk) + compile(exact tail)
            back-to-back (VERDICT r2 weak #5: 200.9s warmup). Tracing/lowering
            is cheap and stays serial; the expensive backend compile releases
            the GIL, so running both `.compile()`s in threads makes the cold
            wall-clock max() of the units instead of sum(). The subsequent
            normal jit calls then load the persistent compilation cache
            instead of recompiling — which is also why this is gated on the
            cache being configured: without it the jit dispatch path would
            pay every compile a second time."""
            if (jax.default_backend() != "tpu"
                    or not jax.config.jax_compilation_cache_dir):
                return
            lowered = []
            for ln in dict.fromkeys(l for l in chunk_lens if l):
                if ln not in chunk_fns:
                    chunk_fns[ln] = make_chunk_fn(ln)
                lowered.append(chunk_fns[ln].lower(
                    params, opt_state, perm, k_steps, jnp.int32(0),
                    buffers, train_u, train_i, excl))
            if exact_tail:
                lowered.append(tail_fn.lower(
                    params, opt_state, perm, k_steps, buffers,
                    train_u, train_i, excl))
            if len(lowered) < 2:
                return  # nothing to overlap
            from concurrent.futures import ThreadPoolExecutor

            with ThreadPoolExecutor(len(lowered)) as pool:
                list(pool.map(lambda l: l.compile(), lowered))

        def epoch_fn(params, opt_state, key, buffers, train_u, train_i, excl):
            k_perm, k_steps = jax.random.split(key)
            perm = perm_fn(k_perm)
            if precompile_state.pop("pending", None):
                precompile_parallel(params, opt_state, perm, k_steps, buffers,
                                    train_u, train_i, excl)
            loss_parts = None
            sim_total = None
            aborted = False
            for c in range(n_chunks):
                ln = chunk_lens[c]
                if ln == 0:
                    continue  # single-batch epoch: only the exact tail runs
                if ln not in chunk_fns:
                    chunk_fns[ln] = make_chunk_fn(ln)
                params, opt_state, out = chunk_fns[ln](
                    params, opt_state, perm, k_steps, jnp.int32(c * chunk),
                    buffers, train_u, train_i, excl)
                if probe_on:
                    parts, sim = out
                    sim_total = sim if sim_total is None else sim_total + sim
                else:
                    parts = out
                loss_parts = parts if loss_parts is None else loss_parts + parts
                # chunk-granular NaN abort (the reference aborts mid-epoch at
                # batch granularity, trainer.py:191-193)
                if n_chunks > 1 and not np.isfinite(np.asarray(parts)).all():
                    aborted = True
                    break
            if exact_tail and not aborted:
                params, opt_state, out = tail_fn(
                    params, opt_state, perm, k_steps, buffers,
                    train_u, train_i, excl)
                parts = out[0] if probe_on else out
                if probe_on:
                    sim_total = (sim_total + out[1]
                                 if sim_total is not None else out[1])
                loss_parts = (parts if loss_parts is None
                              else loss_parts + parts)
            self._epoch_cos_sim = (np.asarray(sim_total)
                                   if sim_total is not None else None)
            return params, opt_state, loss_parts

        return epoch_fn

    # ------------------------------------------------------------------- fit
    def fit(self, dataset, valid_data=None, test_data=None, hyper_tuple=None,
            saved=False):
        config = self.config
        dd = self.model.dd
        valid_data = valid_data if valid_data is not None else dd.eval_valid
        test_data = test_data if test_data is not None else dd.eval_test

        ckp_root = config["ckp_root"] or "./ckp/"
        os.makedirs(ckp_root, exist_ok=True)
        ckpt_path = os.path.join(
            ckp_root,
            f"{config['model']}-{config['dataset']}-"
            f"{config['hyper_parameters']}={hyper_tuple}.pkl")

        seed = config["seed"]
        if isinstance(seed, (list, tuple)):
            seed = seed[0]
        key = jax.random.PRNGKey(int(seed or 2020))
        k_init, key = jax.random.split(key)
        params = self.model.init_params(k_init)
        if self.mesh is not None:
            # place params on the mesh (modality tables row-sharded over
            # 'model', everything else replicated — base.param_shardings);
            # optimizer moments inherit the placement via init-after-put
            params = jax.device_put(
                params, self.model.param_shardings(self.mesh, params))
        opt_state = self.optimizer.init(params)

        cur_step = 0
        start_epoch = 0
        # mid-training resume (no reference equivalent — start_epoch is
        # always 0 there, trainer.py:109; SURVEY.md §5.4)
        if config["resume_from"]:
            from foodrec_tpu.engine import checkpoint as ckpt

            state = ckpt.load_state(config["resume_from"],
                                    opt_state_template=opt_state)
            params = state["params"]
            opt_state = state["opt_state"]
            key = state["key"]
            start_epoch = state["epoch"] + 1
            cur_step = state["cur_step"]
            self.best_valid_score = state["best_valid_score"]
            self.train_loss_dict.update(state["train_loss_dict"])
            self.logger.info(f"resumed from {config['resume_from']} at "
                             f"epoch {start_epoch}")

        # host snapshot: the live `params` buffers are donated into each
        # epoch's chunk_fn, so a device alias would be deleted
        best_params = jax.tree.map(np.asarray, params)
        best_test_upon_valid = {}
        stop = False

        # optional jax.profiler trace of one epoch (SURVEY.md §5.1: the
        # reference only wall-clocks epochs, trainer.py:406-419)
        trace_dir = self.config["profile_trace_dir"]

        for epoch_idx in range(start_epoch, self.epochs):
            t0 = time.time()
            if self.req_training:
                key, k_epoch = jax.random.split(key)
                params = self.model.pre_epoch_processing(params)
                if trace_dir and epoch_idx == 1:  # epoch 0 pays the compile
                    with jax.profiler.trace(trace_dir):
                        params, opt_state, loss_parts = self._epoch_fn(
                            params, opt_state, k_epoch)
                        jax.block_until_ready(loss_parts)
                else:
                    params, opt_state, loss_parts = self._epoch_fn(
                        params, opt_state, k_epoch)
                loss_parts = np.asarray(loss_parts)
                if not np.isfinite(loss_parts).all():
                    self.logger.info(
                        f"Loss is nan at epoch: {epoch_idx}. Exiting.")
                    break
                params = self.model.post_epoch_processing(params)
                self.train_loss_dict[epoch_idx] = float(loss_parts.sum())
                lr_now = self.lr_schedule(epoch_idx * self.n_batches)
                parts_str = ", ".join(
                    f"train_loss{i + 1}: {v / self.n_batches:.4f}"
                    for i, v in enumerate(loss_parts))
                self.logger.info(
                    f"epoch {epoch_idx} training [time: {time.time() - t0:.2f}s, "
                    f"lr: {float(lr_now):.6f}, {parts_str}]")
                if (self.config["calcu_cos_similarity"]
                        and self._epoch_cos_sim is not None):
                    s = self._epoch_cos_sim
                    self.logger.info(
                        "cos-sim (summed over batches) [id-text: "
                        f"{s[0]:.4f}, grad: {s[1]:.4f}, id-image: {s[2]:.4f}, "
                        f"grad: {s[3]:.4f}, pos(text>id): {s[4]:.4f}, "
                        f"pos(image>id): {s[5]:.4f}]")

            if (config["save_state_every"]
                    and (epoch_idx + 1) % config["save_state_every"] == 0):
                import re

                from foodrec_tpu.engine import checkpoint as ckpt

                # tensorstore rejects brackets/quotes in paths — sanitize
                state_path = re.sub(r"[^A-Za-z0-9._=,-]", "_",
                                    os.path.basename(ckpt_path)) + ".state"
                ckpt.save_state(os.path.join(ckp_root, state_path), params,
                                opt_state, epoch_idx, key,
                                self.best_valid_score, cur_step,
                                self.train_loss_dict)

            if (epoch_idx + 1) % self.eval_step == 0:
                t_eval = time.time()
                valid_score, valid_result = self._valid(params, valid_data)
                (self.best_valid_score, cur_step, stop_flag,
                 update_flag) = early_stopping(
                    valid_score, self.best_valid_score, cur_step,
                    max_step=self.stopping_step,
                    bigger=self.valid_metric_bigger)
                self.logger.info(
                    f"epoch {epoch_idx} evaluating [time: "
                    f"{time.time() - t_eval:.2f}s, valid_score: "
                    f"{valid_score:.6f}]")
                self.logger.info(f"valid result: \n{dict2str(valid_result)}")
                if update_flag:
                    self.best_valid_result = valid_result
                    best_params = jax.tree.map(np.asarray, params)
                    if saved:
                        self._save_checkpoint(params, ckpt_path)
                        self.logger.info(f"Saving current best: {ckpt_path}")
                if stop_flag:
                    self.logger.info(
                        f"+++++Finished training, best eval result in epoch "
                        f"{epoch_idx - cur_step * self.eval_step}")
                    stop = True
                    break

        # final test on the best-on-valid params (trainer.py:462-473)
        _, best_test_upon_valid = self._valid(best_params, test_data,
                                              is_test=True)
        return self.best_valid_score, self.best_valid_result, best_test_upon_valid

    # ------------------------------------------------------------------ eval
    def _valid(self, params, eval_set, is_test=False):
        """Dispatch between the reference's three eval paths
        (trainer.py:428-437): eval_by_user (default) > full_sort > sampled."""
        if self.config["eval_by_user"]:
            return self._valid_by_user(params, eval_set)
        if self.config["full_sort"]:
            return self._valid_full_sort(params, is_test)
        return self._valid_sample(params, is_test)

    def _score_fn_cached(self, params):
        cache = self._cache_fn(params)  # graph propagation once per eval
        return functools.partial(self._score_fn, params, cache)

    def _valid_by_user(self, params, eval_set, return_per_user=False):
        cache = self._cache_fn(params)
        block_fn = functools.partial(self._eval_block_fn, self._buffers,
                                     params, cache)
        bs = self.eval_batch_size
        cap = getattr(self.model, "eval_batch_cap", None)
        if cap:
            bs = min(bs, cap)
        return evaluate_by_user(None, eval_set, self.neg_sample_num,
                                batch_size=bs,
                                return_per_user=return_per_user,
                                block_fn=block_fn)

    def _valid_full_sort(self, params, is_test, idx=0):
        """Full-catalog ranking -> TopKEvaluator metrics
        (reference trainer.py:476-503 + topk_evaluator.py)."""
        from foodrec_tpu.engine.topk_evaluator import (
            TopKEvaluator, distributed_full_sort_topk, full_sort_topk)
        from foodrec_tpu.models.base import GeneralRecommender

        ds = self.model.dataset
        if is_test:
            users = list(range(ds.num_users))
            pos_items = ds.testRatings
        else:
            users = ds.valid_users
            pos_items = ds.validRatings
        pos_len = [len(p) for p in pos_items]

        evaluator = TopKEvaluator(self.config)
        # item-sharded distributed sweep when config['mesh_shape'] has a
        # 'model' axis and the model scores by cache dot-product (the base
        # contract; custom scorers like SCHGN gather global item-side
        # buffers and use the replicated sweep)
        model = self.model
        use_dist = (self.mesh is not None
                    and self.mesh.shape.get("model", 1) > 1
                    and type(model).score_from_cache
                    is GeneralRecommender.score_from_cache)
        if use_dist:
            cache = self._cache_fn(params)

            def score_local(cache_local, users_blk, cand_b):
                # base score_from_cache reads only the cache (params unused)
                return model.score_from_cache(None, cache_local, users_blk,
                                              cand_b)

            topk_index = distributed_full_sort_topk(
                self.mesh, score_local, cache, users, ds.num_items,
                max(evaluator.topk),
                user_batch=min(self.eval_batch_size, 64))
        else:
            score_fn = self._score_fn_cached(params)
            topk_index = full_sort_topk(score_fn, users, ds.num_items,
                                        max(evaluator.topk),
                                        user_batch=min(self.eval_batch_size,
                                                       64))
        result = evaluator.evaluate(topk_index, (users, pos_items, pos_len),
                                    is_test=is_test, idx=idx)
        valid_metric = (self.config["valid_metric"] or "NDCG@20").lower()
        score = result.get(valid_metric, result.get("ndcg@20", 0.0))
        return score, result

    def _valid_sample(self, params, is_test):
        """Sampled rank-of-positive eval: candidates per positive interaction
        are [user's 500 negatives, positive] (reference trainer.py:298-349;
        EvalDataLoader full_sort=False, dataloader.py:174-220)."""
        from foodrec_tpu.engine.topk_evaluator import sample_rank_metrics

        ds = self.model.dataset
        rows_u, rows_c = [], []
        if is_test:
            per_user = zip(range(ds.num_users), ds.testRatings,
                           ds.testNegatives)
        else:
            per_user = zip(ds.valid_users, ds.validRatings, ds.validNegatives)
        for u, pos_list, negs in per_user:
            for p in pos_list:
                rows_u.append(u)
                rows_c.append(list(negs) + [p])
        users = np.asarray(rows_u, dtype=np.int32)
        cand = np.asarray(rows_c, dtype=np.int32)

        score_fn = self._score_fn_cached(params)
        bs = min(self.eval_batch_size,
                 getattr(self.model, "eval_batch_cap", None)
                 or self.eval_batch_size)
        pad = (-len(users)) % bs
        users_p = np.concatenate([users, np.zeros(pad, users.dtype)])
        cand_p = np.concatenate(
            [cand, np.zeros((pad, cand.shape[1]), cand.dtype)])
        # dispatch all blocks, sync once (tunnel round-trip latency)
        preds = [score_fn(jnp.asarray(users_p[s:s + bs]),
                          jnp.asarray(cand_p[s:s + bs]))
                 for s in range(0, len(users_p), bs)]
        pred_list = np.asarray(jnp.concatenate(preds))[:len(users)]
        result = sample_rank_metrics(pred_list, self.neg_sample_num)
        return result["NDCG@20"], result

    def evaluate(self, params, eval_set, is_test=False):
        return self._valid(params, eval_set, is_test)[1]

    # ----------------------------------------------------------- study evals
    # The reference exposes cold/warm, sense/unsense and per-health-level
    # by-user evals as standalone trainer methods over dedicated feeders
    # (trainer.py:631-804; feeders dataloader.py:305-499). Here each split is
    # one padded EvalSet through the same batched evaluator; per-user metric
    # arrays and raw predictions are returned like the *_record_prediction
    # variants (trainer.py:525-582).
    def _study_eval(self, params, users, ratings, negatives):
        from foodrec_tpu.data.device import build_eval_set

        es = build_eval_set(users, ratings, negatives)
        score_fn = self._score_fn_cached(params)
        bs = min(self.eval_batch_size,
                 getattr(self.model, "eval_batch_cap", None)
                 or self.eval_batch_size)
        _, metrics, per_user, preds = evaluate_by_user(
            score_fn, es, self.neg_sample_num, batch_size=bs,
            return_per_user=True)
        return metrics, per_user, preds

    def cold_start_study(self, params):
        """Requires config['cold_study'] data (trainer.py:631-688)."""
        ds = self.model.dataset
        cold = self._study_eval(params, ds.cold_users, ds.coldRatings,
                                ds.coldNegatives)
        warm = self._study_eval(params, ds.warm_users, ds.warmRatings,
                                ds.warmNegatives)
        return {"cold": cold[0], "warm": warm[0],
                "cold_predictions": cold[2], "warm_predictions": warm[2]}

    def sense_study(self, params):
        """Requires config['sense_study'] data (trainer.py:747-804)."""
        ds = self.model.dataset
        sense = self._study_eval(params, ds.sense_users, ds.senseRatings,
                                 ds.senseNegatives)
        unsense = self._study_eval(params, ds.unsense_users,
                                   ds.unsenseRatings, ds.unsenseNegatives)
        return {"sense": sense[0], "unsense": unsense[0],
                "sense_predictions": sense[2],
                "unsense_predictions": unsense[2]}

    def health_level_study(self, params, n_levels=6):
        """Requires config['health_level_study'] data (trainer.py:690-745)."""
        ds = self.model.dataset
        out = {}
        for hl in range(n_levels):
            if not len(ds.healthUsers[hl]):
                continue
            metrics, _, _ = self._study_eval(
                params, ds.healthUsers[hl], ds.healthRatings[hl],
                ds.healthNegatives[hl])
            out[f"health_{hl}"] = metrics
        return out

    def plot_train_loss(self, show=False, path=None):
        """Epoch-loss curve dump (reference trainer.py:505-523)."""
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        epochs = sorted(self.train_loss_dict)
        plt.figure()
        plt.plot(epochs, [self.train_loss_dict[e] for e in epochs])
        plt.xticks(epochs)
        plt.xlabel("Epoch")
        plt.ylabel("Loss")
        if path:
            plt.savefig(path)
        if show:
            plt.show()
        plt.close()

    # ------------------------------------------------------------ checkpoint
    @staticmethod
    def _save_checkpoint(params, path):
        from foodrec_tpu.engine import checkpoint as ckpt

        ckpt.save_best(params, path)

    @staticmethod
    def load_checkpoint(path):
        from foodrec_tpu.engine import checkpoint as ckpt

        return ckpt.load_best(path)


def get_trainer():
    """Registry hook (reference: utils.py:43-44)."""
    return Trainer
