from telugu_asr_tpu.runtime.native import (
    NativeAudioDecoder,
    build_native_library,
    native_available,
)

__all__ = ["NativeAudioDecoder", "build_native_library", "native_available"]
