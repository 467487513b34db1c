from nemo_tpu.core.config import (  # noqa: F401
    ConfigDict,
    from_config_dict,
    load_yaml,
    parse_overrides,
    to_yaml,
)
from nemo_tpu.core.optim import get_optimizer, register_optimizer  # noqa: F401
from nemo_tpu.core.lr_schedulers import get_scheduler, register_scheduler  # noqa: F401
