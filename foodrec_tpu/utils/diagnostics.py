# coding: utf-8
"""Embedding/gradient diagnostics (reference: FoodRec/common/trainer.py:584-629).

The reference's `calcu_similarity` reads `model.id_emb/text_emb/image_emb`
plus their .grad — attributes none of the six shipped models actually set
(it supports unshipped variants behind `calcu_cos_similarity`). The
functional equivalent takes the same-dim embedding matrices and their
gradients explicitly and returns the same 6-tuple:

  (cos(id,text), cos(g_id,g_text), cos(id,image), cos(g_id,g_image),
   frac(norm'd text > norm'd id), frac(norm'd image > norm'd id))
"""

import jax.numpy as jnp


def _cos_rows(a, b, eps=1e-8):
    na = jnp.maximum(jnp.linalg.norm(a, axis=-1), eps)
    nb = jnp.maximum(jnp.linalg.norm(b, axis=-1), eps)
    return jnp.sum(a * b, axis=-1) / (na * nb)


def embedding_cos_similarity(id_emb, text_emb, image_emb,
                             id_grad, text_grad, image_grad):
    id_text = jnp.mean(_cos_rows(id_emb, text_emb))
    id_text_grad = jnp.mean(_cos_rows(id_grad, text_grad))
    id_image = jnp.mean(_cos_rows(id_emb, image_emb))
    id_image_grad = jnp.mean(_cos_rows(id_grad, image_grad))

    def unit(x):
        return x / jnp.linalg.norm(x, axis=-1, keepdims=True)

    pos_id_text = jnp.mean((unit(text_emb) - unit(id_emb)) > 0)
    pos_id_image = jnp.mean((unit(image_emb) - unit(id_emb)) > 0)
    return (id_text, id_text_grad, id_image, id_image_grad,
            pos_id_text, pos_id_image)
