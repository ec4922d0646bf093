from idgrec_tpu.engine.loop import train_model

__all__ = ["train_model"]
