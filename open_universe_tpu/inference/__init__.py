from .streaming import enhance_streaming
