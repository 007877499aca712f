from foodrec_tpu.common.loss import bpr_loss, emb_loss, l2_loss  # noqa: F401
from foodrec_tpu.common.init import xavier_normal, xavier_uniform  # noqa: F401
