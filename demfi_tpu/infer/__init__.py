from demfi_tpu.infer.engine import InferenceEngine, WindowResult

__all__ = ["InferenceEngine", "WindowResult"]
