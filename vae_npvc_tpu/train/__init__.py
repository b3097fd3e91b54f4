"""Trainer registry (reference dotted trainer_type strings → classes)."""

from __future__ import annotations

from .trainer import Trainer, TrainState  # noqa: F401

_REGISTRY = {
    "vae_npvc.trainer.basic": Trainer,
    "basic": Trainer,
}


def _lazy_gan():
    from .gan import GanTrainer
    return GanTrainer


def register(name, cls):
    _REGISTRY[name] = cls
    return cls


def get_trainer_cls(trainer_type: str):
    key = trainer_type.split(":")[0]
    if key in ("vae_npvc.trainer.wgan_gp", "wgan_gp"):
        return _lazy_gan()
    if key in _REGISTRY:
        return _REGISTRY[key]
    short = key.rsplit(".", 1)[-1]
    if short in _REGISTRY:
        return _REGISTRY[short]
    raise KeyError(
        f"unknown trainer_type {trainer_type!r}; known: {sorted(_REGISTRY)}")


def build_trainer(config, **kw):
    cls = get_trainer_cls(config.get("trainer_type", "vae_npvc.trainer.basic"))
    return cls(config, **kw)
