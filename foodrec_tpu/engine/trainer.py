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
import pickle
import time

import jax
import jax.numpy as jnp
import numpy as np
import optax

from foodrec_tpu.data.sampling import sample_negatives
from foodrec_tpu.engine.evaluator import evaluate_by_user
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

        self._train_u = jnp.asarray(dd.train_u)
        self._train_i = jnp.asarray(dd.train_i)
        self._excl = jnp.asarray(dd.excl_bitmap)
        self._epoch_fn = self._build_epoch_fn()
        self._cache_fn = jax.jit(model.eval_cache)
        self._score_fn = jax.jit(model.score_from_cache)

        self.best_valid_score = -1.0
        self.best_valid_result = None
        self.train_loss_dict = {}

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
        train_u, train_i, excl = self._train_u, self._train_i, self._excl
        num_items = model.dd.num_items

        @jax.jit
        def epoch_fn(params, opt_state, key):
            k_perm, k_steps = jax.random.split(key)
            perm = jax.random.permutation(k_perm, n_train)
            pad = n_batches * bs - n_train
            perm = jnp.concatenate([perm, perm[:pad]]).astype(jnp.int32)
            step_keys = jax.random.split(k_steps, n_batches)

            def train_step(carry, step_key_idx):
                params, opt_state = carry
                key, batch_idx = step_key_idx
                start = batch_idx * bs
                idx = jax.lax.dynamic_slice_in_dim(perm, start, bs)
                weight = (start + jnp.arange(bs)) < n_train
                u = train_u[idx]
                i = train_i[idx]
                k_neg, k_model = jax.random.split(key)
                neg = sample_negatives(k_neg, u, excl, num_items,
                                       n_tries=n_tries)
                batch = {"u_id": u, "pos_i_id": i, "neg_i_id": neg,
                         "weight": weight.astype(jnp.float32),
                         "key": k_model}

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

                    params, opt_state = jax.lax.cond(
                        batch_idx % beta == 0, mg_update, plain_update,
                        (params, opt_state))
                else:
                    params, opt_state = apply_update(params, opt_state, grads)
                return (params, opt_state), parts

            (params, opt_state), parts = jax.lax.scan(
                train_step, (params, opt_state),
                (step_keys, jnp.arange(n_batches)))
            return params, opt_state, jnp.sum(parts, axis=0)

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
        opt_state = self.optimizer.init(params)

        cur_step = 0
        best_params = params
        best_test_upon_valid = {}
        stop = False

        for epoch_idx in range(self.epochs):
            t0 = time.time()
            if self.req_training:
                key, k_epoch = jax.random.split(key)
                params = self.model.pre_epoch_processing(params)
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
                    best_params = params
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
        cache = self._cache_fn(params)  # graph propagation once per eval
        score_fn = functools.partial(self._score_fn, params, cache)
        bs = self.eval_batch_size
        cap = getattr(self.model, "eval_batch_cap", None)
        if cap:
            bs = min(bs, cap)
        return evaluate_by_user(score_fn, eval_set, self.neg_sample_num,
                                batch_size=bs)

    def evaluate(self, params, eval_set, is_test=False):
        return self._valid(params, eval_set, is_test)[1]

    # ------------------------------------------------------------ checkpoint
    @staticmethod
    def _save_checkpoint(params, path):
        host = jax.tree.map(np.asarray, params)
        with open(path, "wb") as f:
            pickle.dump(host, f)

    @staticmethod
    def load_checkpoint(path):
        with open(path, "rb") as f:
            host = pickle.load(f)
        return jax.tree.map(jnp.asarray, host)


def get_trainer():
    """Registry hook (reference: utils.py:43-44)."""
    return Trainer
