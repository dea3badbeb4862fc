"""Raw-fragment JSON encoding for the serving result path.

The v1 status contract inlines a <=20k-point float preview into every
completed job's JSON (reference backend/app.py:496-506, 545-559). On a
one-core host, `json.dumps` float repr over ~1.7 MB of numbers is the
single biggest serialization cost per job; the native serializer
(native/src/serialize.cpp) produces those array fragments at
memory-bandwidth speed. :class:`RawJSON` lets a handler embed such a
pre-serialized fragment inside an otherwise ordinary dict, and
:func:`dumps_raw` splices the fragments into the encoded body.

Splice safety: the placeholder contains a NUL control character, which
`json.dumps` always escapes to ``BACKSLASH-u0000`` inside genuine string
content (and a literal backslash in content doubles), so the quoted
placeholder pattern cannot collide with user data.
"""

from __future__ import annotations

import json
from typing import Any

__all__ = ["RawJSON", "dumps_raw"]

_NUL = chr(0)


class RawJSON:
    """A pre-serialized JSON fragment (bytes) embeddable in a dict."""

    __slots__ = ("data",)

    def __init__(self, data: bytes | str):
        self.data = data.encode() if isinstance(data, str) else data

    def parsed(self) -> Any:
        """Decode back to Python structures (tests / non-HTTP consumers)."""
        return json.loads(self.data)


def dumps_raw(obj: Any) -> bytes:
    """``json.dumps(obj).encode()`` with RawJSON fragments spliced in."""
    frags: list[bytes] = []

    def default(o):
        if isinstance(o, RawJSON):
            frags.append(o.data)
            return f"{_NUL}RAW{len(frags) - 1}{_NUL}"
        raise TypeError(
            f"Object of type {type(o).__name__} is not JSON serializable"
        )

    text = json.dumps(obj, default=default)
    if not frags:
        return text.encode()
    # json.dumps escapes the placeholder's NULs, so it appears in the
    # output as the quoted string "BACKSLASH-u0000RAW<i>BACKSLASH-u0000"
    # — replace each occurrence with its fragment.
    parts = text.split('"' + "\\u0000RAW")
    out = [parts[0].encode()]
    for part in parts[1:]:
        idx, rest = part.split("\\u0000" + '"', 1)
        out.append(frags[int(idx)])
        out.append(rest.encode())
    return b"".join(out)
