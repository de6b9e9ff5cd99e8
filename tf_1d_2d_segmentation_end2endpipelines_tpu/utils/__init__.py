"""Typed config (INI-compatible) + misc helpers."""

from .config import (  # noqa: F401
    TestConfig,
    TrainConfig,
    load_test_config,
    load_train_config,
    save_test_config,
    save_train_config,
)
