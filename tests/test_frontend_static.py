"""Static CI for the browser frontend (no browser on this rig).

The ~1,300 LoC of dependency-free ES modules in frontend/src mirror the
reference's React app (App.jsx). Nothing can execute them here (no
Chrome/node in the image — ROADMAP.md), so this regression net checks
the three failure classes that bit the reference most easily:

1. DOM wiring: every element id the JS looks up exists in index.html
   (the reference's App.jsx:1266-2040 binds ~40 ids by hand).
2. API contract: every multipart field api.js submits is accepted by the
   v1 server's /process parser, and every results key the JS reads is
   produced by the server (reference App.jsx:953-1005 vs app.py:545-559).
3. Module graph: every relative import resolves to a file, every
   imported name is exported somewhere in that file, and the HTML entry
   point loads the root module.
"""

import re
from pathlib import Path

FRONTEND = Path(__file__).resolve().parent.parent / "frontend"
SRC = FRONTEND / "src"


def _js_sources():
    return {p.name: p.read_text(encoding="utf-8") for p in SRC.glob("*.js")}


def _html():
    return (FRONTEND / "index.html").read_text(encoding="utf-8")


def _strip_comments(js: str) -> str:
    js = re.sub(r"/\*.*?\*/", "", js, flags=re.S)
    return re.sub(r"^\s*//.*$", "", js, flags=re.M)


class TestDomWiring:
    def test_every_id_lookup_resolves(self):
        html = _html()
        html_ids = set(re.findall(r'id="([^"]+)"', html))
        missing = {}
        for name, js in _js_sources().items():
            js = _strip_comments(js)
            used = set(re.findall(r'\$\("([^"]+)"\)', js))
            used |= set(re.findall(r'getElementById\("([^"]+)"\)', js))
            bad = used - html_ids
            if bad:
                missing[name] = sorted(bad)
        assert not missing, f"JS references ids absent from index.html: {missing}"

    def test_no_duplicate_ids_in_html(self):
        ids = re.findall(r'id="([^"]+)"', _html())
        dupes = {i for i in ids if ids.count(i) > 1}
        assert not dupes, f"duplicate ids in index.html: {dupes}"


class TestApiContract:
    def test_submitted_fields_are_accepted_by_server(self):
        """Every fd.append("name", ...) in api.js must be a param the v1
        /process parser reads (PARITY.md deviation 9: form fields are
        honored here, unlike the reference which drops them)."""
        api = _js_sources()["api.js"]
        sent = set(re.findall(r'fd\.append\("([^"]+)"', api)) - {"file"}

        server = (
            Path(__file__).resolve().parent.parent
            / "image_to_pointcloud_tpu/serve/app_v1.py"
        ).read_text(encoding="utf-8")
        accepted = set(re.findall(r'q\.get\(\s*"([^"]+)"', server))
        unknown = sent - accepted
        assert not unknown, (
            f"api.js sends fields the server ignores: {unknown} "
            f"(server accepts {sorted(accepted)})"
        )

    def test_results_keys_read_by_js_are_produced(self):
        """Keys the frontend reads off results/preview must exist in the
        server's results dict (app_v1 results contract, reference
        app.py:545-559)."""
        js_all = _strip_comments("\n".join(_js_sources().values()))
        reads = set(re.findall(r"results?\.(\w+)", js_all))
        # Drop generic method calls and locals that happen to match.
        reads &= {
            "pointCloud", "gisData", "downloadUrl", "preview",
            "meshPreview", "depthMap",
        }
        server = (
            Path(__file__).resolve().parent.parent
            / "image_to_pointcloud_tpu/serve/app_v1.py"
        ).read_text(encoding="utf-8")
        produced = set(
            re.findall(r'"(pointCloud|gisData|downloadUrl|preview|meshPreview|depthMap)":', server)
        )
        assert reads <= produced, f"JS reads keys the server never produces: {reads - produced}"
        # and the big six are all actually produced
        assert produced == {
            "pointCloud", "gisData", "downloadUrl", "preview",
            "meshPreview", "depthMap",
        }

    def test_poll_and_status_fields(self):
        js_all = "\n".join(_js_sources().values())
        for field in ("job_id", "status", "progress", "message"):
            assert field in js_all, f"frontend never reads status field {field!r}"


class TestModuleGraph:
    def test_relative_imports_resolve_and_names_exported(self):
        srcs = _js_sources()
        for name, js in srcs.items():
            for m in re.finditer(
                r'import\s*{([^}]*)}\s*from\s*"\./([\w.]+)"', js, flags=re.S
            ):
                names = [
                    n.strip().split(" as ")[0]
                    for n in m.group(1).split(",")
                    if n.strip()
                ]
                target = m.group(2)
                assert target in srcs, f"{name} imports missing module {target}"
                tjs = srcs[target]
                exported = set(
                    re.findall(
                        r"export\s+(?:async\s+)?(?:function|const|class|let)\s+(\w+)",
                        tjs,
                    )
                )
                for ex in re.findall(r"export\s*{([^}]*)}", tjs, flags=re.S):
                    exported |= {
                        n.strip().split(" as ")[-1]
                        for n in ex.split(",")
                        if n.strip()
                    }
                for n in names:
                    assert n in exported, (
                        f"{name} imports {n!r} which {target} does not export"
                    )

    def test_html_loads_root_module(self):
        html = _html()
        m = re.search(r'<script[^>]*type="module"[^>]*src="([^"]+)"', html)
        assert m, "index.html has no module entry point"
        entry = m.group(1).lstrip("./")
        assert (FRONTEND / entry).exists(), f"entry module {entry} missing"

    def test_css_is_linked(self):
        html = _html()
        m = re.search(r'<link[^>]*href="([^"]+\.css)"', html)
        assert m, "index.html links no stylesheet"
        assert (FRONTEND / m.group(1).lstrip("./")).exists()


class TestCrossLanguageConstants:
    def test_js_plasma_lut_matches_backend(self):
        """depthdecode.js embeds the PLASMA LUT as base64; its bytes must
        equal ops/colormap.PLASMA_RGB exactly — the client-side inverse
        decode (reference App.jsx:200-221's faithful replacement) only
        round-trips backend previews if the tables are identical."""
        import base64

        import numpy as np

        from image_to_pointcloud_tpu.ops.colormap import PLASMA_RGB

        js = (SRC / "depthdecode.js").read_text(encoding="utf-8")
        m = re.search(
            r"const PLASMA_B64\s*=\s*((?:\s*\"[^\"]*\"\s*\+?)+);", js
        )
        assert m, "PLASMA_B64 literal not found in depthdecode.js"
        b64 = "".join(re.findall(r'"([^"]*)"', m.group(1)))
        lut = np.frombuffer(base64.b64decode(b64), np.uint8).reshape(256, 3)
        np.testing.assert_array_equal(lut, np.asarray(PLASMA_RGB, np.uint8))
