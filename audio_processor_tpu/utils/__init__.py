from audio_processor_tpu.utils.text import remove_special_characters

__all__ = ["remove_special_characters"]
