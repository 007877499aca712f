# coding: utf-8
"""Full-sort top-k evaluator (reference: FoodRec/utils/topk_evaluator.py).

The device side replaces the reference's per-batch torch.topk + pad_sequence
with a tiled users x items scoring loop and on-chip jax.lax.top_k
(`full_sort_topk` below); metric reduction reuses the numpy kernels in
engine/matrics.py. CSV dump of recommended top-k preserved
(topk_evaluator.py:87-100).
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pandas as pd

from foodrec_tpu.engine.matrics import metrics_dict
from foodrec_tpu.utils.misc import get_local_time

topk_metrics = {m.lower(): m for m in
                ["Recall", "Recall2", "Precision", "NDCG", "MAP"]}


def full_sort_topk(score_fn, users, n_items, k, user_batch=64,
                   item_chunk=8192):
    """Top-k item indices per user from a tiled full-catalog scoring sweep.

    score_fn(users[B], cand[B, C]) -> [B, C] — the same per-block contract as
    the by-user eval, fed with consecutive item-id chunks. Running top-k
    merge keeps [B, k] on device; one jit per (B, C) shape.
    """
    users = np.asarray(users, dtype=np.int32)
    u = len(users)
    pad = (-u) % user_batch
    if pad:
        users = np.concatenate([users, np.zeros(pad, users.dtype)])

    n_chunks = -(-n_items // item_chunk)

    @jax.jit
    def sweep(users_blk):
        best_s = jnp.full((users_blk.shape[0], k), -jnp.inf)
        best_i = jnp.zeros((users_blk.shape[0], k), jnp.int32)
        for c in range(n_chunks):
            start = c * item_chunk
            cand = start + jnp.arange(item_chunk, dtype=jnp.int32)
            valid = cand < n_items
            cand_c = jnp.minimum(cand, n_items - 1)
            s = score_fn(users_blk, jnp.broadcast_to(
                cand_c, (users_blk.shape[0], item_chunk)))
            s = jnp.where(valid[None, :], s, -jnp.inf)
            merged_s = jnp.concatenate([best_s, s], axis=1)
            merged_i = jnp.concatenate(
                [best_i, jnp.broadcast_to(cand_c,
                                          (users_blk.shape[0], item_chunk))],
                axis=1)
            best_s, sel = jax.lax.top_k(merged_s, k)
            best_i = jnp.take_along_axis(merged_i, sel, axis=1)
        return best_i

    # dispatch all blocks before syncing once (high per-call tunnel latency)
    out = [sweep(jnp.asarray(users[s:s + user_batch]))
           for s in range(0, len(users), user_batch)]
    return np.asarray(jnp.concatenate(out))[:u]


def distributed_full_sort_topk(mesh, score_fn, cache, users, n_items, k,
                               user_batch=64):
    """Item-sharded full-catalog top-k over the mesh's 'model' axis
    (SURVEY.md §7 step 8; the reference op being scaled is torch.topk over
    the whole catalog, trainer.py:495-497).

    Every cache array with leading dim == n_items is row-sharded over
    'model'; each shard scores its local item slice for the user block and
    takes a local `lax.top_k`, then the (n_shards, k) partial winners are
    all-gathered over ICI and merged with one more top_k. Per-block
    communication is O(n_shards * k) — the users x items matmul itself never
    leaves the shard.

    score_fn(cache_local, users_blk [B], cand_local [B, C]) -> [B, C] where
    cand_local are LOCAL row indices into the cache shard (the base
    `score_from_cache` contract; models that gather global item-side buffers
    in their scorer must use the replicated sweep instead).
    """
    from jax.experimental.shard_map import shard_map
    from jax.sharding import NamedSharding, PartitionSpec as P

    n_sh = int(mesh.shape["model"])
    i_pad = -(-n_items // n_sh) * n_sh
    shard = i_pad // n_sh
    local_k = min(k, shard)

    def pad_items(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == n_items:
            widths = [(0, i_pad - n_items)] + [(0, 0)] * (x.ndim - 1)
            return jnp.pad(x, widths)
        return x

    cache_p = jax.tree.map(pad_items, cache)
    specs = jax.tree.map(
        lambda x: (P("model", *([None] * (x.ndim - 1)))
                   if hasattr(x, "ndim") and x.ndim >= 1
                   and x.shape[0] == i_pad else P()),
        cache_p)
    # place the shards up front: each device holds only its rows
    cache_p = jax.device_put(cache_p, jax.tree.map(
        lambda s: NamedSharding(mesh, s), specs,
        is_leaf=lambda s: isinstance(s, P)))

    def body(users_blk, cache_local):
        off = jax.lax.axis_index("model") * shard
        cand_local = jnp.arange(shard, dtype=jnp.int32)
        cand_b = jnp.broadcast_to(cand_local, (users_blk.shape[0], shard))
        s = score_fn(cache_local, users_blk, cand_b)
        valid = (off + cand_local) < n_items
        s = jnp.where(valid[None, :], s, -jnp.inf)
        best_s, best_i = jax.lax.top_k(s, local_k)          # per-shard top-k
        best_i = best_i + off                                # back to global ids
        all_s = jax.lax.all_gather(best_s, "model")          # [n_sh, B, k']
        all_i = jax.lax.all_gather(best_i, "model")
        b = users_blk.shape[0]
        all_s = jnp.moveaxis(all_s, 0, 1).reshape(b, n_sh * local_k)
        all_i = jnp.moveaxis(all_i, 0, 1).reshape(b, n_sh * local_k)
        _, sel = jax.lax.top_k(all_s, k)                     # cross-shard merge
        return jnp.take_along_axis(all_i, sel, axis=1)

    sweep = jax.jit(shard_map(
        body, mesh=mesh, in_specs=(P(), specs), out_specs=P(),
        check_rep=False))

    users = np.asarray(users, dtype=np.int32)
    u = len(users)
    pad = (-u) % user_batch
    if pad:
        users = np.concatenate([users, np.zeros(pad, users.dtype)])
    out = [sweep(jnp.asarray(users[s:s + user_batch]), cache_p)
           for s in range(0, len(users), user_batch)]
    return np.asarray(jnp.concatenate(out))[:u]


class TopKEvaluator:
    def __init__(self, config):
        self.config = config
        self.metrics = config["metrics"]
        self.topk = config["topk"]
        self.save_recom_result = config["save_recommended_topk"]
        self._check_args()

    def evaluate(self, topk_index, eval_data, is_test=False, idx=0):
        """topk_index: [U, max_k] item ids; eval_data = (pos_user, pos_items,
        pos_len_list) (topk_evaluator.py:68-115)."""
        pos_user, pos_items, pos_len_list = eval_data
        pos_len = np.asarray(pos_len_list)
        topk_index = np.asarray(topk_index)

        if self.save_recom_result and is_test:
            max_k = max(self.topk)
            dir_name = os.path.abspath(self.config["recommend_topk"]
                                       or "recommend_topk/")
            os.makedirs(dir_name, exist_ok=True)
            file_path = os.path.join(dir_name, "{}-{}-idx{}-top{}-{}.csv".format(
                self.config["model"], self.config["dataset"], idx, max_k,
                get_local_time()))
            x_df = pd.DataFrame(topk_index)
            x_df.insert(0, "id", pos_user)
            x_df.columns = ["id"] + ["top_" + str(i) for i in range(max_k)]
            x_df.astype(int).to_csv(file_path, sep="\t", index=False)

        assert len(pos_len) == len(topk_index)
        bool_rec = np.zeros(topk_index.shape, dtype=bool)
        for row, (m, n) in enumerate(zip(pos_items, topk_index)):
            pos_set = set(m)
            bool_rec[row] = [i in pos_set for i in n]

        metric_dict = {}
        for metric in self.metrics:
            value = metrics_dict[metric.lower()](bool_rec, pos_len)
            for k in self.topk:
                metric_dict[f"{metric}@{k}"] = round(float(value[k - 1]), 4)
        return metric_dict

    def _check_args(self):
        if isinstance(self.metrics, str):
            self.metrics = [self.metrics]
        if not isinstance(self.metrics, list):
            raise TypeError("metrics must be str or list")
        for m in self.metrics:
            if m.lower() not in topk_metrics:
                raise ValueError(
                    f"There is no user grouped topk metric named {m}!")
        self.metrics = [m.lower() for m in self.metrics]

        if isinstance(self.topk, int):
            self.topk = [self.topk]
        if not isinstance(self.topk, list):
            raise TypeError("The topk must be a integer, list")
        for k in self.topk:
            if k <= 0:
                raise ValueError(
                    "topk must be a positive integer or a list of positive "
                    f"integers, but get `{k}`")

    def __str__(self):
        return ("The TopK Evaluator Info:\n\tMetrics:["
                + ", ".join(topk_metrics[m] for m in self.metrics)
                + "], TopK:[" + ", ".join(map(str, self.topk)) + "]")


def sample_rank_metrics(pred_list, neg_num):
    """Rank-of-positive metrics for the sampled path: candidates per row =
    [neg_1..neg_K, pos] (reference trainer.py:317-349)."""
    pred_list = np.asarray(pred_list)
    auc = np.sum(pred_list[:, :-1] < pred_list[:, -1:]) / (
        len(pred_list) * pred_list.shape[1] - len(pred_list))
    rank = (-pred_list).argsort().argsort()[:, -1]

    metrics = {"AUC": float(auc)}
    mrr = float(np.mean(1.0 / (rank + 1.0)))
    for k in (1, 5, 10, 20):
        hit = rank < k
        metrics[f"HIT@{k}"] = float(np.mean(hit))
        metrics[f"NDCG@{k}"] = float(np.mean(
            np.where(hit, 1.0 / np.log2(rank + 2.0), 0.0)))
    metrics["MRR"] = mrr
    # key order parity with the reference dict (AUC, MRR, HIT@*, NDCG@*)
    ordered = {"AUC": metrics["AUC"], "MRR": mrr}
    for k in (1, 5, 10, 20):
        ordered[f"HIT@{k}"] = metrics[f"HIT@{k}"]
    for k in (1, 5, 10, 20):
        ordered[f"NDCG@{k}"] = metrics[f"NDCG@{k}"]
    return ordered
