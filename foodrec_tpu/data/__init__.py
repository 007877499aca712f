from foodrec_tpu.data.dataset import FoodData  # noqa: F401
from foodrec_tpu.data.device import DeviceData  # noqa: F401
