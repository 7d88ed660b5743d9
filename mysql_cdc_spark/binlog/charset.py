"""MySQL collation → Python codec resolution for string decode.

MySQL logs text values as raw bytes in the COLUMN's character set; the
collation ids arrive in TABLE_MAP optional metadata (WL#4618:
``DEFAULT_CHARSET`` carries one table default plus per-column override
pairs, ``COLUMN_CHARSET`` an explicit per-column list — both indexed
over the table's CHARACTER columns only). The reference decodes every
string as UTF-8 (``extensions.rs read_string`` → ``String::from_utf8``),
which silently corrupts or errors on the very common legacy ``latin1``
deployment; this module is the beyond-reference fix — collation id →
Python codec, threaded through BOTH decode paths.

Collation-id table from the public ``INFORMATION_SCHEMA.COLLATIONS``
(MySQL 8.4 / MariaDB 11 unions). Every id of a charset family maps to
the same codec, so only families need enumerating; the modern utf8mb4
collation blocks are covered as ranges. MySQL's ``latin1`` is cp1252
(it defines 0x80–0x9F, unlike ISO-8859-1), and ``utf16``/``utf32``/
``ucs2`` are big-endian without BOM.

Unknown collations fall back to UTF-8 — the only safe default (it is
both MySQL's modern default and a superset check: a wrong guess fails
loudly on decode instead of transposing characters). ``BINARY_COLLATION``
(63) maps to ``None`` — bytes stay bytes.
"""

from __future__ import annotations

from .constants import ColumnType

BINARY_COLLATION = 63

# charset family → (python codec, collation ids). Ranges are inclusive.
_FAMILIES: dict[str, tuple[str, list]] = {
    "utf8mb4": ("utf-8", [45, 46, (224, 247), (255, 327)]),
    "utf8mb3": ("utf-8", [33, 76, 83, (192, 223), 254]),
    "latin1": ("cp1252", [5, 8, 15, 31, 47, 48, 49, 94]),
    "ascii": ("ascii", [11, 65]),
    "latin2": ("iso8859-2", [2, 9, 21, 27, 77]),
    "latin5": ("iso8859-9", [30, 78]),
    "latin7": ("iso8859-13", [20, 41, 42, 79]),
    "greek": ("iso8859-7", [25, 70]),
    "hebrew": ("iso8859-8", [16, 71]),
    "cp1250": ("cp1250", [26, 34, 44, 66, 99]),
    "cp1251": ("cp1251", [14, 23, 50, 51, 52]),
    "cp1256": ("cp1256", [57, 67]),
    "cp1257": ("cp1257", [29, 58, 59]),
    "cp850": ("cp850", [4, 80]),
    "cp852": ("cp852", [40, 81]),
    "cp866": ("cp866", [36, 68]),
    "koi8r": ("koi8-r", [7, 74]),
    "koi8u": ("koi8-u", [22, 75]),
    "tis620": ("tis-620", [18, 89]),
    "macce": ("mac-latin2", [38, 43]),
    "macroman": ("mac-roman", [39, 53]),
    "sjis": ("shift_jis", [13, 88]),
    "cp932": ("cp932", [95, 96]),
    "ujis": ("euc_jp", [12, 91]),
    "euckr": ("euc_kr", [19, 85]),
    "gb2312": ("gb2312", [24, 86]),
    "gbk": ("gbk", [28, 87]),
    "gb18030": ("gb18030", [(248, 250)]),
    "big5": ("big5", [1, 84]),
    "utf16": ("utf-16-be", [54, 55, (101, 124)]),
    "utf16le": ("utf-16-le", [56, 62]),
    "utf32": ("utf-32-be", [60, 61, (160, 183)]),
    "ucs2": ("utf-16-be", [35, 90, (128, 151), 159]),
}

_CODEC_BY_COLLATION: dict[int, str] = {}
for _codec, _ids in _FAMILIES.values():
    for _i in _ids:
        if isinstance(_i, tuple):
            for _c in range(_i[0], _i[1] + 1):
                _CODEC_BY_COLLATION[_c] = _codec
        else:
            _CODEC_BY_COLLATION[_i] = _codec


def codec_for_collation(collation: int) -> str | None:
    """Python codec for a MySQL collation id; ``None`` for binary (63),
    ``"utf-8"`` for unknown ids (documented fallback)."""
    if collation == BINARY_COLLATION:
        return None
    return _CODEC_BY_COLLATION.get(int(collation), "utf-8")


_BLOB_TYPES = frozenset(
    (
        ColumnType.TINY_BLOB,
        ColumnType.MEDIUM_BLOB,
        ColumnType.LONG_BLOB,
        ColumnType.BLOB,
    )
)


def is_character_column(column_type: int, metadata: int) -> bool:
    """Mirror of the server's ``is_character_type`` (sql/log_event.cc):
    CHAR / VARCHAR / TEXT-or-BLOB participate in the charset metadata
    sections; ENUM/SET (packed inside STRING metadata) have their own
    ``ENUM_AND_SET_*`` sections and do not."""
    if column_type in (ColumnType.VARCHAR, ColumnType.VAR_STRING):
        return True
    if column_type in _BLOB_TYPES:
        return True
    if column_type == ColumnType.STRING:
        from . import kernels as K

        real, _ = K.get_actual_string_type(column_type, metadata)
        return real not in (ColumnType.ENUM, ColumnType.SET)
    return False


def column_codecs(table: dict) -> list[str | None]:
    """Per-column Python codec for a parsed TABLE_MAP dict.

    Returns one entry per table column: a codec name for character
    columns, ``None`` for everything else (numerics, temporals, ENUM/SET,
    JSON/GEOMETRY/VECTOR — and for binary-collation TEXT/BLOB columns,
    whose bytes must stay bytes). Character columns with NO charset
    metadata at all (pre-5.6 logs, fixtures without the TLVs) default to
    ``"utf-8"`` — exactly the reference's behavior, so streams that
    decoded before keep decoding identically."""
    types = table["column_types"]
    metas = table["column_metadata"]
    default_cs = table.get("default_charset")
    column_cs = table.get("column_charsets")
    out: list[str | None] = []
    char_ord = 0  # ordinal among character columns (the TLVs' index space)
    for ct, md in zip(types, metas):
        if not is_character_column(ct, md):
            out.append(None)
            continue
        collation = None
        if column_cs is not None and char_ord < len(column_cs):
            collation = column_cs[char_ord]
        elif default_cs is not None:
            collation = default_cs["charset_collations"].get(
                char_ord, default_cs["default_collation"]
            )
        char_ord += 1
        out.append(
            "utf-8" if collation is None else codec_for_collation(collation)
        )
    return out


def table_codecs(table: dict) -> list[str | None]:
    """Memoized ``column_codecs`` keyed on the table dict (same caching
    pattern as ``reader._signed_widths``)."""
    cached = table.get("_codecs")
    if cached is None:
        cached = column_codecs(table)
        table["_codecs"] = cached
    return cached
