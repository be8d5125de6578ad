"""Training utilities: optimization, schedules, camera paths, logging."""

from .assets import ASSETS, default_data_dir, download_asset
from .checkpoint import (
    AsyncCheckpointer,
    TrainState,
    latest_checkpoint,
    load_train_state,
    save_train_state,
)
from .debug import enable_debug_nans, init_from_env, profile
from .camera_paths import (
    fibonacci_hemisphere,
    hemisphere,
    look_at_extrinsics,
    orbit,
    rotation_about_axis,
    shuffle_positions,
)
from .optim import (
    AdamState,
    adam_init,
    adam_update,
    clip_gradients,
    exponential_lr,
    global_norm,
)
from .progress import ETABar, LogEntry, write_log

__all__ = [
    "ASSETS",
    "default_data_dir",
    "download_asset",
    "AsyncCheckpointer",
    "TrainState",
    "latest_checkpoint",
    "load_train_state",
    "save_train_state",
    "enable_debug_nans",
    "init_from_env",
    "profile",
    "fibonacci_hemisphere",
    "hemisphere",
    "look_at_extrinsics",
    "orbit",
    "rotation_about_axis",
    "shuffle_positions",
    "AdamState",
    "adam_init",
    "adam_update",
    "clip_gradients",
    "exponential_lr",
    "global_norm",
    "ETABar",
    "LogEntry",
    "write_log",
]
