from deduplidog_ray.audio.codecs import CodecError, decode, encode, CODECS

__all__ = ["CodecError", "decode", "encode", "CODECS"]
