from . import audio, audio_host

__all__ = ["audio", "audio_host"]
