# coding: utf-8
"""Device-side PRNG sampling for the jit train loop.

Replaces the host rejection loops of the reference dataloader:
  * uniform negative item sampling excluding train ∪ valid/test positives
    (FoodRec/utils/dataloader.py:145-151)
  * SCHGN's masked-ingredient SSL task: mask with p=0.2 -> mask token
    n_ingredients+1 plus a sampled negative ingredient not in the recipe
    (dataloader.py:117-143; utils.py:186-190)

A fixed number of draws T replaces the unbounded `while True`; the first
non-excluded draw is taken. With exclusion mass < a few %, P(all T collide)
< 1e-20 at T=32; if everything collides the last draw is used.
"""

import jax
import jax.numpy as jnp


def is_excluded(excl_bitmap, users, items):
    """Packed-bitmap membership: True where `items` is a positive of `users`."""
    words = excl_bitmap[users, items >> 5]
    return ((words >> (items & 31).astype(jnp.uint32)) & 1).astype(jnp.bool_)


def sample_negatives(key, users, excl_bitmap, num_items, n_tries=32):
    """One negative item per user, uniform over non-positive items.

    users: int32 [B]; returns int32 [B].
    """
    b = users.shape[0]
    draws = jax.random.randint(key, (n_tries, b), 0, num_items, dtype=jnp.int32)
    bad = is_excluded(excl_bitmap, jnp.broadcast_to(users, (n_tries, b)), draws)
    # index of the first valid draw (argmax of ~bad); falls back to the last
    # draw if all collide
    first_ok = jnp.argmax(~bad, axis=0)
    any_ok = jnp.any(~bad, axis=0)
    pick = jnp.where(any_ok, first_ok, n_tries - 1)
    return draws[pick, jnp.arange(b)]


def sample_health_stratified_negatives(key, users, pos_items, excl_bitmap,
                                       health_level, bucket_items,
                                       in_sample_set, train_items,
                                       n_tries=32):
    """Second, health-stratified negative per sample (reference
    dataloader.py:22-25, 87-114): users in `neg_sample_set` draw from the
    health bucket of their POSITIVE item (`health_level[pos_i_id]`); others
    draw uniformly over the TRAIN item list (`random.choice(train_item_list)`).
    Both paths rejection-test against the user's train ∪ valid/test positives.

    pos_items: int32 [B] positive item per sample
    health_level: int32 [num_items] scalar health level per item
    bucket_items: int32 [n_buckets, L] padded item-id lists (pad = -1)
    in_sample_set: bool [num_users]
    train_items: int32 [n_train_items] distinct train item ids
    """
    b = users.shape[0]
    buckets = health_level[pos_items]                    # [B]
    lists = bucket_items[buckets]                        # [B, L]
    lens = jnp.sum(lists >= 0, axis=1)                   # [B]
    draws = jax.random.randint(key, (n_tries, b), 0,
                               jnp.iinfo(jnp.int32).max, dtype=jnp.int32)
    slots = draws % jnp.maximum(lens, 1)[None, :]
    cand_b = jnp.take_along_axis(lists, slots.T, axis=1).T  # [T, B]
    cand_b = jnp.maximum(cand_b, 0)
    cand_u = train_items[draws % train_items.shape[0]]      # [T, B]
    # empty buckets fall back to the uniform path (the reference would raise
    # on random.choice([]) — guarded here)
    use_bucket = in_sample_set[users] & (lens > 0)           # [B]
    cand = jnp.where(use_bucket[None, :], cand_b, cand_u)
    bad = is_excluded(excl_bitmap, jnp.broadcast_to(users, (n_tries, b)),
                      cand)
    first_ok = jnp.argmax(~bad, axis=0)
    any_ok = jnp.any(~bad, axis=0)
    pick = jnp.where(any_ok, first_ok, n_tries - 1)
    return cand[pick, jnp.arange(b)]


def ssl_mask_ingredients(key, ingre_codes, ingre_num, n_ingredients,
                         masked_p=0.2, n_tries=16):
    """SCHGN masked-ingredient task, fully vectorized.

    ingre_codes: int32 [B, L] padded with n_ingredients; ingre_num: int32 [B].
    Returns (masked_seq, pos_seq, neg_seq) each int32 [B, L]:
      * real positions are masked with prob `masked_p` -> token n_ingredients+1
      * masked positions get a negative ingredient not present in the recipe
      * unmasked / pad positions copy the original code (dataloader.py:117-143)
    """
    b, L = ingre_codes.shape
    k_mask, k_neg = jax.random.split(key)
    real = jnp.arange(L)[None, :] < ingre_num[:, None]
    do_mask = (jax.random.uniform(k_mask, (b, L)) < masked_p) & real

    masked_seq = jnp.where(do_mask, n_ingredients + 1, ingre_codes)

    # negative ingredient per position: first of n_tries uniform draws that is
    # not one of the recipe's real ingredients (utils.py:186-190)
    draws = jax.random.randint(k_neg, (n_tries, b, L), 0, n_ingredients,
                               dtype=jnp.int32)
    real_codes = jnp.where(real, ingre_codes, -1)  # [B, L]
    in_recipe = jnp.any(draws[:, :, :, None] == real_codes[None, :, None, :],
                        axis=-1)  # [T, B, L]
    first_ok = jnp.argmax(~in_recipe, axis=0)
    any_ok = jnp.any(~in_recipe, axis=0)
    pick = jnp.where(any_ok, first_ok, n_tries - 1)
    neg_draw = jnp.take_along_axis(
        draws, pick[None, :, :], axis=0)[0]

    neg_seq = jnp.where(do_mask, neg_draw, ingre_codes)
    pos_seq = ingre_codes
    return masked_seq, pos_seq, neg_seq
