from .streaming import enhance_streaming, enhance_streaming_sharded
