# coding: utf-8
"""Device-resident dataset: static-shape arrays for jit-compiled epochs.

The reference feeds training through a torch DataLoader whose __getitem__ does
per-sample Python work — rejection negative sampling and 2048-d feature gathers
on the host (FoodRec/utils/dataloader.py:50-115), then ships each batch to the
device (trainer.py:178-179). Here the whole dataset lives on device once:

  * train interactions as flat int32 arrays
  * a packed uint32 positive-bitmap per user for O(1) on-chip membership tests
    (replaces the `not in train_pos and not in validTest_pos` rejection test,
    dataloader.py:145-151)
  * item side-features (image/text/ingredients/levels) as dense tables gathered
    inside the jit train step
  * eval candidate sets pre-padded to one static [U, C] block per split
    (replaces the per-user generator EvalByUserDataloader,
    dataloader.py:228-302)
"""

import dataclasses
from typing import Optional

import numpy as np

MAX_INGRE_LEN = 20  # preprocessing pads ingredient codes to 20 (dataloader.py:18)


def _round_up(x, m):
    return -(-x // m) * m


@dataclasses.dataclass(frozen=True)
class EvalSet:
    """Padded per-user candidate lists: [positives, negatives-minus-dup-pos].

    Mirrors the candidate construction of EvalByUserDataloader
    (dataloader.py:232-238): candidates = pos_items + (negatives with any
    positive removed); the first `n_pos[u]` slots are the positives.
    """

    users: np.ndarray   # int32 [U]
    cand: np.ndarray    # int32 [U, C] candidate item ids (0-padded)
    n_pos: np.ndarray   # int32 [U]
    n_cand: np.ndarray  # int32 [U]

    @property
    def n_users(self):
        return len(self.users)

    @property
    def width(self):
        return self.cand.shape[1]


def build_eval_set(users, ratings, negatives, pad_multiple=128):
    """Build a padded EvalSet from per-user positive/negative lists.

    Uses the native assembler (foodrec_tpu/native/fastload.cpp) when the
    negative lists are rectangular; falls back to the python path."""
    neg_lens = {len(n) for n in negatives}
    if len(neg_lens) == 1 and len(negatives):
        from foodrec_tpu import native

        k = neg_lens.pop()
        max_pos = max((len(p) for p in ratings), default=0)
        width = _round_up(max_pos + k, pad_multiple)
        out = native.build_eval_set_arrays(
            [list(p) for p in ratings],
            np.asarray(negatives, dtype=np.int32), width)
        if out is not None:
            cand, n_pos, n_cand = out
            return EvalSet(users=np.asarray(users, dtype=np.int32),
                           cand=cand, n_pos=n_pos, n_cand=n_cand)

    cand_lists, n_pos = [], []
    for pos_list, neg_list in zip(ratings, negatives):
        pos = list(pos_list)
        pos_set = set(pos)
        # remove duplicated positives from the negative list, preserving order
        # (dataloader.py:235-237 removes the first occurrence per positive)
        negs, removed = [], set()
        for x in neg_list:
            if x in pos_set and x not in removed:
                removed.add(x)
                continue
            negs.append(x)
        cand_lists.append(pos + negs)
        n_pos.append(len(pos))

    width = _round_up(max(len(c) for c in cand_lists), pad_multiple)
    cand = np.zeros((len(cand_lists), width), dtype=np.int32)
    n_cand = np.zeros(len(cand_lists), dtype=np.int32)
    for i, c in enumerate(cand_lists):
        cand[i, :len(c)] = c
        n_cand[i] = len(c)
    return EvalSet(users=np.asarray(users, dtype=np.int32), cand=cand,
                   n_pos=np.asarray(n_pos, dtype=np.int32), n_cand=n_cand)


def _pack_bitmap(pairs_u, pairs_i, n_users, n_items):
    from foodrec_tpu import native

    out = native.pack_bitmap(pairs_u, pairs_i, n_users, n_items)
    if out is not None:
        return out
    words = _round_up(n_items, 32) // 32
    bitmap = np.zeros((n_users, words), dtype=np.uint32)
    np.bitwise_or.at(bitmap, (pairs_u, pairs_i >> 5),
                     np.uint32(1) << (pairs_i & 31).astype(np.uint32))
    return bitmap


@dataclasses.dataclass
class DeviceData:
    """All arrays a model/trainer needs, as host numpy ready for device put."""

    n_users: int
    n_items: int
    num_users: int      # train-file derived (dataset.py:30); sampling range uses
    num_items: int      # num_items (dataloader.py:147)
    n_ingredients: int

    train_u: np.ndarray           # int32 [n_train]
    train_i: np.ndarray           # int32 [n_train]
    excl_bitmap: np.ndarray       # uint32 [num_users, ceil(num_items/32)]

    img: np.ndarray               # float32 [n_items, D_img]
    txt: np.ndarray               # float32 [n_items, D_txt]
    ingre_codes: np.ndarray       # int32 [n_items, 20]
    ingre_num: np.ndarray         # int32 [n_items]

    eval_valid: EvalSet
    eval_test: EvalSet

    cal_level: Optional[np.ndarray] = None      # int32 [n_items]
    health_level: Optional[np.ndarray] = None   # int32 [n_items]
    health_mh: Optional[np.ndarray] = None      # float32 [n_items, H]

    # health-stratified second-negative sampling (dataloader.py:22-25, 87-114)
    health_bucket_items: Optional[np.ndarray] = None  # int32 [6, L], pad -1
    health_in_sample: Optional[np.ndarray] = None     # bool [num_users]
    train_items_arr: Optional[np.ndarray] = None      # int32 [n_train_items]

    @property
    def n_train(self):
        return len(self.train_u)

    @classmethod
    def from_food_data(cls, dataset, config):
        n_users, n_items = dataset.num_users, dataset.num_items

        train_u = dataset._train_u.astype(np.int32)
        train_i = dataset._train_i.astype(np.int32)

        # exclusion = train positives ∪ valid/test positives (dataloader.py:149)
        ex_u = [train_u]
        ex_i = [train_i]
        for u, items in dataset.validTestRatings.items():
            if items:
                arr = np.fromiter(items, dtype=np.int64)
                ex_u.append(np.full(len(arr), u, dtype=np.int64))
                ex_i.append(arr)
        ex_u = np.concatenate(ex_u).astype(np.int64)
        ex_i = np.concatenate(ex_i).astype(np.int64)
        excl = _pack_bitmap(ex_u, ex_i, n_users, n_items)

        eval_valid = build_eval_set(dataset.valid_users, dataset.validRatings,
                                    dataset.validNegatives)
        eval_test = build_eval_set(list(range(n_users)), dataset.testRatings,
                                   dataset.testNegatives)

        def dict_to_array(d, dtype=np.int32):
            arr = np.zeros(dataset.n_items, dtype=dtype)
            for k, v in d.items():
                arr[k] = v
            return arr

        cal_level = health_level = health_mh = None
        if getattr(dataset, "cal_level", None) is not None and config["use_cal_level"]:
            cal_level = dict_to_array(dataset.cal_level)
        if config["use_health_level"] and getattr(dataset, "health_level", None) is not None:
            health_level = dict_to_array(dataset.health_level)
        if (config["use_health_level_multi_hot"]
                and getattr(dataset, "health_level_multi_hot", None) is not None):
            H = len(dataset.health_level_multi_hot[0])
            health_mh = np.zeros((dataset.n_items, H), dtype=np.float32)
            for k, v in dataset.health_level_multi_hot.items():
                health_mh[k] = np.asarray(v, dtype=np.float32)

        health_bucket_items = health_in_sample = train_items_arr = None
        if config["health_neg_sample"]:
            # buckets keyed by the POSITIVE item's health level; users outside
            # neg_sample_set fall back to uniform over train items
            # (dataloader.py:87-114)
            assert health_level is not None, (
                "health_neg_sample requires use_health_level "
                "(reference reads dataset.health_level[pos_i_id])")
            buckets = [dataset.health_0, dataset.health_1, dataset.health_2,
                       dataset.health_3, dataset.health_4, dataset.health_5]
            width = max((len(b) for b in buckets), default=0) or 1
            health_bucket_items = np.full((6, width), -1, dtype=np.int32)
            for bi, b in enumerate(buckets):
                health_bucket_items[bi, :len(b)] = np.asarray(b, np.int32)
            health_in_sample = np.zeros(n_users, dtype=bool)
            idx = np.asarray(sorted(dataset.neg_sample_set), dtype=np.int64)
            health_in_sample[idx[idx < n_users]] = True
            train_items_arr = np.asarray(dataset.train_item_list,
                                         dtype=np.int32)

        return cls(
            n_users=dataset.n_users, n_items=dataset.n_items,
            num_users=n_users, num_items=n_items,
            n_ingredients=dataset.num_ingredients,
            train_u=train_u, train_i=train_i, excl_bitmap=excl,
            img=np.asarray(dataset.embImage, dtype=np.float32),
            txt=np.asarray(dataset.embText, dtype=np.float32),
            ingre_codes=np.asarray(dataset.ingredientCodeDict, dtype=np.int32),
            ingre_num=np.asarray(dataset.ingredientNum, dtype=np.int32),
            eval_valid=eval_valid, eval_test=eval_test,
            cal_level=cal_level, health_level=health_level, health_mh=health_mh,
            health_bucket_items=health_bucket_items,
            health_in_sample=health_in_sample,
            train_items_arr=train_items_arr,
        )
