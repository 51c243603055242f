"""L0+L1 in JAX: bit/word builders & parsers, BCH, Manchester.

Everything here is shape-polymorphic over leading batch dimensions and
jit/vmap/shard_map-safe: words are (..., 28)/(..., 36) uint8 bit arrays,
encode/decode are GF(2) matmuls + table gathers, Manchester is reshapes.
"""

from amps_tpu.codec.bits import expandbits, packbits  # noqa: F401
from amps_tpu.codec.bch import (  # noqa: F401
    focc_bch_encode,
    recc_bch_encode,
    recc_bch_decode,
)
from amps_tpu.codec.manchester import (  # noqa: F401
    manchester_encode_symbols,
    manchester_decode_bits,
)
from amps_tpu.codec import words  # noqa: F401
