from .decode import Decoder, DecodeResult
