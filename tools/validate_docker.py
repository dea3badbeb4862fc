"""Docker-less validation of the deployment files (VERDICT r4 item 8).

No docker daemon exists on this rig, so `Dockerfile.backend`,
`Dockerfile.frontend` and `docker-compose.yml` (reference parity: its
compose file at docker-compose.yml:1-24 with 0-byte Dockerfiles) have
never been *built* — and files nobody executes rot silently. This tool
statically validates everything that can rot without a daemon:

- Dockerfile structure: known instructions, FROM first, ≤1 CMD,
  exec-form CMD is valid JSON.
- Every COPY source resolves inside the build context.
- Entrypoints exist in the copied tree: `python -m pkg.mod` must map to
  `pkg/mod(.py|/__main__.py)` under a COPY'd prefix; `python path.py`
  must be a COPY'd file. `RUN python -c "...import X..."` roots must be
  copied too.
- requirements.txt referenced by COPY+pip parses (no empty specs).
- compose: dockerfiles exist, service `command` entrypoints re-checked
  against the image's COPY set, ports are N:N, named volumes declared,
  bind-mount sources are repo paths or creatable (./x).

Exit 0 + "OK" when clean; exit 1 with one line per finding otherwise.
Run directly or via tests/test_docker_validate.py (CI-style guard).
"""

from __future__ import annotations

import json
import re
import shlex
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]

KNOWN = {
    "FROM", "RUN", "CMD", "COPY", "ADD", "ENV", "EXPOSE", "WORKDIR",
    "ENTRYPOINT", "ARG", "LABEL", "USER", "VOLUME", "SHELL",
    "HEALTHCHECK", "STOPSIGNAL", "ONBUILD",
}


def parse_dockerfile(path: Path) -> list[tuple[str, str]]:
    """[(INSTRUCTION, args)] with line continuations folded."""
    text = path.read_text()
    # Fold backslash continuations.
    text = re.sub(r"\\\s*\n", " ", text)
    out = []
    for line in text.splitlines():
        line = line.strip()
        if not line or line.startswith("#"):
            continue
        ins, _, rest = line.partition(" ")
        out.append((ins.upper(), rest.strip()))
    return out


def module_exists(root: Path, mod: str) -> bool:
    p = root / Path(*mod.split("."))
    return (
        p.with_suffix(".py").exists()
        or (p / "__main__.py").exists()
        or (p / "__init__.py").exists()
    )


def check_python_argv(argv: list[str], copied: list[str], where: str,
                      errors: list[str]) -> None:
    """Validate a `python ...` command against the image's COPY'd tree.

    ``copied`` is the list of context-relative prefixes COPY'd into the
    image workdir; entrypoint modules/files must live under one.
    """
    if not argv or Path(argv[0]).name not in ("python", "python3"):
        return
    it = iter(range(1, len(argv)))
    for i in it:
        a = argv[i]
        if a == "-m":
            if i + 1 >= len(argv):
                errors.append(f"{where}: `python -m` without a module")
                return
            mod = argv[i + 1]
            if not module_exists(REPO, mod):
                errors.append(f"{where}: module `{mod}` not in repo")
            root = mod.split(".")[0]
            if not any(
                c == root or c.startswith(root + "/") for c in copied
            ):
                errors.append(
                    f"{where}: module `{mod}` is not under any COPY'd "
                    f"path {copied}"
                )
            return
        if a == "-c":
            code = argv[i + 1] if i + 1 < len(argv) else ""
            for m in re.findall(
                r"(?:from|import)\s+([A-Za-z_][\w.]*)", code
            ):
                root = m.split(".")[0]
                if (REPO / root).exists() and not any(
                    c == root or c.startswith(root + "/") for c in copied
                ):
                    errors.append(
                        f"{where}: -c imports `{root}` which is not COPY'd"
                    )
            return
        if a.startswith("-"):
            continue
        if a.endswith(".py"):
            if not (REPO / a).exists():
                errors.append(f"{where}: script `{a}` not in repo")
            if not any(
                a == c or a.startswith(c.rstrip("/") + "/") or c in ("", ".")
                for c in copied
            ):
                errors.append(
                    f"{where}: script `{a}` is not under any COPY'd path "
                    f"{copied}"
                )
        return


def validate_dockerfile(path: Path, errors: list[str]) -> list[str]:
    """Returns the context-relative COPY'd prefixes (for compose reuse)."""
    where = path.name
    if not path.exists():
        errors.append(f"{where}: missing")
        return []
    ins = parse_dockerfile(path)
    if not ins:
        errors.append(f"{where}: empty (reference placeholder rot?)")
        return []
    first = next((i for i, (k, _) in enumerate(ins) if k != "ARG"), 0)
    if ins[first][0] != "FROM":
        errors.append(f"{where}: first instruction is {ins[first][0]}, not FROM")
    unknown = [k for k, _ in ins if k not in KNOWN]
    for k in unknown:
        errors.append(f"{where}: unknown instruction {k}")
    cmds = [(k, v) for k, v in ins if k in ("CMD", "ENTRYPOINT")]
    if sum(1 for k, _ in cmds if k == "CMD") > 1:
        errors.append(f"{where}: multiple CMDs (only the last applies)")

    copied: list[str] = []
    for k, v in ins:
        if k not in ("COPY", "ADD"):
            continue
        parts = shlex.split(v)
        parts = [p for p in parts if not p.startswith("--")]
        if len(parts) < 2:
            errors.append(f"{where}: {k} needs src and dst: `{v}`")
            continue
        for src in parts[:-1]:
            rel = src.rstrip("/")
            if "*" in rel or "?" in rel:
                if not list(REPO.glob(rel)):
                    errors.append(f"{where}: {k} glob `{src}` matches nothing")
                continue
            if not (REPO / rel).exists():
                errors.append(
                    f"{where}: {k} source `{src}` not in build context"
                )
            copied.append(rel)

    for k, v in ins:
        if k in ("CMD", "ENTRYPOINT"):
            if v.startswith("["):
                try:
                    argv = json.loads(v)
                except json.JSONDecodeError as e:
                    errors.append(f"{where}: {k} is not valid JSON: {e}")
                    continue
            else:
                argv = shlex.split(v)
            check_python_argv(argv, copied, f"{where} {k}", errors)
        if k == "RUN" and ("python -c" in v or "python3 -c" in v):
            check_python_argv(shlex.split(v), copied, f"{where} RUN", errors)
        if k == "RUN" and "pip install" in v and "-r" in v:
            m = re.search(r"-r\s+(\S+)", v)
            if m:
                req = m.group(1)
                if req not in copied and not (REPO / req).exists():
                    errors.append(f"{where}: pip -r `{req}` not COPY'd")
                else:
                    _validate_requirements(REPO / req, errors)
    return copied


def _validate_requirements(path: Path, errors: list[str]) -> None:
    if not path.exists():
        errors.append(f"{path.name}: missing")
        return
    for n, line in enumerate(path.read_text().splitlines(), 1):
        line = line.split("#")[0].strip()
        if not line:
            continue
        if not re.match(r"^[A-Za-z0-9._\[\]-]+\s*(?:[<>=!~;].*)?$", line):
            errors.append(f"{path.name}:{n}: unparseable spec `{line}`")


def validate_compose(path: Path, copied_by_df: dict, errors: list[str]) -> None:
    import yaml

    where = path.name
    if not path.exists():
        errors.append(f"{where}: missing")
        return
    try:
        doc = yaml.safe_load(path.read_text())
    except yaml.YAMLError as e:
        errors.append(f"{where}: YAML parse failure: {e}")
        return
    services = doc.get("services") or {}
    if not services:
        errors.append(f"{where}: no services")
    declared_vols = set((doc.get("volumes") or {}).keys())
    for name, svc in services.items():
        w = f"{where}:{name}"
        df = (svc.get("build") or {}).get("dockerfile")
        if df:
            if not (REPO / df).exists():
                errors.append(f"{w}: dockerfile `{df}` missing")
        for p in svc.get("ports") or []:
            if not re.match(r"^\d+:\d+$", str(p)):
                errors.append(f"{w}: malformed port mapping `{p}`")
        for v in svc.get("volumes") or []:
            src = str(v).split(":")[0]
            if src in declared_vols:
                continue
            if src.startswith("./") or src.startswith("/"):
                continue  # bind mounts create-on-run / host paths
            errors.append(f"{w}: volume `{src}` neither declared nor a path")
        for e in svc.get("environment") or []:
            if "=" not in str(e):
                errors.append(f"{w}: environment entry `{e}` has no value")
        cmd = svc.get("command")
        if cmd and df in copied_by_df:
            argv = shlex.split(cmd) if isinstance(cmd, str) else list(cmd)
            check_python_argv(argv, copied_by_df[df], w, errors)
        for dep in svc.get("depends_on") or []:
            if dep not in services:
                errors.append(f"{w}: depends_on unknown service `{dep}`")


def main() -> int:
    errors: list[str] = []
    copied_by_df = {}
    for df in ("Dockerfile.backend", "Dockerfile.frontend"):
        copied_by_df[df] = validate_dockerfile(REPO / df, errors)
    validate_compose(REPO / "docker-compose.yml", copied_by_df, errors)
    if errors:
        for e in errors:
            print(f"FAIL {e}")
        return 1
    print("OK docker deployment files validate (no daemon needed)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
