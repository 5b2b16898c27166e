"""Codec package: registry wiring + public API."""

from . import blob as blob
from . import composite as _composite
from . import numeric as _numeric
from .blob import (  # noqa: F401
    BITPACK,
    CODEC_IDS,
    CODEC_NAMES,
    DELTA_VARINT,
    DICT,
    DT_BIN,
    DT_F32,
    DT_F64,
    DT_I32,
    DT_I64,
    DT_LIST,
    DT_STR,
    DT_U8,
    DT_U32,
    DT_U64,
    FSST,
    LIST,
    RAW,
    RLE,
    SCALED,
    SPLIT,
    VARINT,
    ZSTD,
    ListValues,
    VarlenArray,
    decode_blob,
    decode_values,
    encode_blob,
    is_list,
    is_varlen,
)
from .select import encode_auto, select_codec  # noqa: F401
from .varint import (  # noqa: F401
    varint_byte_lengths,
    varint_decode,
    varint_decode_scalar,
    varint_encode,
    zigzag_decode,
    zigzag_encode,
)

_numeric.register_all()
_composite.register_all()

from . import lists as _lists  # noqa: E402

_lists.register_all()

from . import nested as _nested  # noqa: E402

_nested.register_all()

from . import scaled as _scaled  # noqa: E402

_scaled.register_all()

try:  # FSST registers itself if present (build plan §7 step 7)
    from . import fsst as _fsst

    _fsst.register_all()
except ImportError:  # pragma: no cover
    pass
