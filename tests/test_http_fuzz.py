"""Deterministic fuzz of the first-party HTTP body parsers.

The server is hand-written (serve/http.py); random adversarial bytes
must never raise out of the multipart/urlencoded parsers (a parser
exception would 500 a request the reference's stack would 400/ignore).
Fixed seed: failures are reproducible.
"""

import random

from image_to_pointcloud_tpu.serve.http import Request


def test_multipart_parser_never_raises():
    rnd = random.Random(0)
    ctypes = [
        "multipart/form-data; boundary=x",
        'multipart/form-data; boundary="',
        "multipart/form-data; boundary=" + "-" * 30,
        'multipart/form-data; boundary="quoted"',
        "multipart/form-data",
        "application/x-www-form-urlencoded",
        "",
    ]
    for i in range(2000):
        body = bytes(rnd.randrange(256) for _ in range(rnd.randrange(0, 300)))
        req = Request(
            method="POST", path="/", query={},
            headers={"content-type": ctypes[i % len(ctypes)]}, body=body,
        )
        form = req.form  # must not raise
        files = req.files
        assert isinstance(form, dict) and isinstance(files, dict)


def test_multipart_structured_edge_cases():
    """Hand-picked boundary/framing edges: empty parts, missing headers,
    bare boundary, no terminating --, binary filenames."""
    b = b"--B"
    cases = [
        b"",
        b"--B--",
        b + b"\r\n\r\n\r\n" + b + b"--",
        b + b'\r\nContent-Disposition: form-data; name="a"\r\n\r\n1\r\n' + b + b"--",
        b + b'\r\nContent-Disposition: form-data\r\n\r\nx\r\n' + b + b"--",
        b + b'\r\nContent-Disposition: form-data; name="f"; filename="\xff\x00"\r\n\r\nDATA\r\n' + b + b"--",
        b + b'\r\nContent-Disposition: form-data; name="a"\r\n\r\n'
        + b"\r\n" * 5 + b + b"--",
    ]
    for body in cases:
        req = Request(
            method="POST", path="/", query={},
            headers={"content-type": "multipart/form-data; boundary=B"},
            body=body,
        )
        _ = req.form, req.files  # must not raise
    # A well-formed part still parses correctly amid the edge set.
    req = Request(
        method="POST", path="/", query={},
        headers={"content-type": "multipart/form-data; boundary=B"},
        body=b'--B\r\nContent-Disposition: form-data; name="k"\r\n\r\nv\r\n--B--',
    )
    assert req.form == {"k": "v"}
