"""Offline wheel builder: produce dist/tstore_spark-<ver>-py3-none-any.whl.

This container has setuptools but not the `wheel` package, so
`pip install <repo>` cannot build a wheel in-place (setup.py bdist_wheel is
unavailable). A wheel, however, is just a zip laid out per the public
binary-distribution spec (PEP 427): package files +
`<name>-<ver>.dist-info/{METADATA,WHEEL,entry_points.txt,RECORD}`. We render
the metadata straight from pyproject.toml (stdlib tomllib) and zip the
package; `pip install dist/*.whl` then works anywhere with no build backend —
the artifact a cluster admin actually ships alongside
`spark-submit --py-files`.

    python tools/build_wheel.py          # -> dist/tstore_spark-0.3.0-py3-none-any.whl
    pip install dist/tstore_spark-*.whl
"""

from __future__ import annotations

import base64
import csv
import hashlib
import io
import os
import sys
import tomllib
import zipfile


def _b64_nopad(digest: bytes) -> str:
    return base64.urlsafe_b64encode(digest).rstrip(b"=").decode("ascii")


def _metadata(proj: dict, root: str) -> bytes:
    lines = [
        "Metadata-Version: 2.1",
        f"Name: {proj['name']}",
        f"Version: {proj['version']}",
        f"Summary: {proj.get('description', '')}",
    ]
    if "license" in proj and "text" in proj["license"]:
        lines.append(f"License: {proj['license']['text']}")
    if proj.get("keywords"):
        lines.append("Keywords: " + ",".join(proj["keywords"]))
    for c in proj.get("classifiers", []):
        lines.append(f"Classifier: {c}")
    if "requires-python" in proj:
        lines.append(f"Requires-Python: {proj['requires-python']}")
    for dep in proj.get("dependencies", []):
        lines.append(f"Requires-Dist: {dep}")
    for extra, deps in proj.get("optional-dependencies", {}).items():
        lines.append(f"Provides-Extra: {extra}")
        for dep in deps:
            lines.append(f'Requires-Dist: {dep} ; extra == "{extra}"')
    body = ""
    readme = proj.get("readme")
    if readme and os.path.exists(os.path.join(root, readme)):
        lines.append("Description-Content-Type: text/markdown")
        body = open(os.path.join(root, readme), encoding="utf-8").read()
    return ("\n".join(lines) + "\n\n" + body).encode("utf-8")


def _entry_points(proj: dict) -> bytes:
    out = ["[console_scripts]"]
    for name, target in proj.get("scripts", {}).items():
        out.append(f"{name} = {target}")
    return ("\n".join(out) + "\n").encode("utf-8")


def build(out_dir: str = "dist") -> str:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    os.makedirs(os.path.join(root, out_dir), exist_ok=True)

    with open(os.path.join(root, "pyproject.toml"), "rb") as fh:
        proj = tomllib.load(fh)["project"]
    norm = proj["name"].replace("-", "_")
    base = f"{norm}-{proj['version']}"
    dist_info = f"{base}.dist-info"
    out_path = os.path.join(root, out_dir, f"{base}-py3-none-any.whl")

    records: list[tuple[str, str, str]] = []

    def add(zf: zipfile.ZipFile, arcname: str, data: bytes) -> None:
        # fixed timestamp -> byte-reproducible wheel for identical inputs
        info = zipfile.ZipInfo(arcname, date_time=(2020, 1, 1, 0, 0, 0))
        info.external_attr = 0o644 << 16
        zf.writestr(info, data, zipfile.ZIP_DEFLATED)
        records.append((arcname, f"sha256={_b64_nopad(hashlib.sha256(data).digest())}", str(len(data))))

    with zipfile.ZipFile(out_path, "w") as zf:
        pkg = os.path.join(root, "tstore_spark")
        for dirpath, dirnames, filenames in os.walk(pkg):
            dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
            for fname in sorted(filenames):
                if fname.endswith(".py"):
                    full = os.path.join(dirpath, fname)
                    add(zf, os.path.relpath(full, root).replace(os.sep, "/"),
                        open(full, "rb").read())
        add(zf, f"{dist_info}/METADATA", _metadata(proj, root))
        add(zf, f"{dist_info}/entry_points.txt", _entry_points(proj))
        add(zf, f"{dist_info}/WHEEL", (
            "Wheel-Version: 1.0\n"
            "Generator: tstore-build-wheel (offline)\n"
            "Root-Is-Purelib: true\n"
            "Tag: py3-none-any\n"
        ).encode())
        # RECORD last, listing itself with empty hash/size per PEP 376
        buf = io.StringIO()
        w = csv.writer(buf, lineterminator="\n")
        for row in records:
            w.writerow(row)
        w.writerow((f"{dist_info}/RECORD", "", ""))
        info = zipfile.ZipInfo(f"{dist_info}/RECORD", date_time=(2020, 1, 1, 0, 0, 0))
        info.external_attr = 0o644 << 16
        zf.writestr(info, buf.getvalue(), zipfile.ZIP_DEFLATED)

    return out_path


if __name__ == "__main__":
    print(build(sys.argv[1] if len(sys.argv) > 1 else "dist"))
