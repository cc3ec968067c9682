#!/bin/sh
# Install the repo's git hooks (r5 verdict item 1: a hard pre-commit
# gate on the pure-Python registry/front guard — seconds, no Spark).
# Usage: sh scripts/install_hooks.sh
cd "$(git rev-parse --show-toplevel)" || exit 1
cat > .git/hooks/pre-commit <<'HOOK'
#!/bin/sh
cd "$(git rev-parse --show-toplevel)" || exit 1
python -m pytest tests/test_queries.py -k "registry or front" -q --no-header -x || {
  echo "pre-commit: registry/front guard failed — fix before committing" >&2
  exit 1
}
HOOK
chmod +x .git/hooks/pre-commit
echo "pre-commit hook installed"
