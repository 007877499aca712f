from foodrec_tpu.utils.misc import (  # noqa: F401
    dict2str,
    early_stopping,
    get_local_time,
    init_seed,
)
from foodrec_tpu.utils.logger import init_logger  # noqa: F401
