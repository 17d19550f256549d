"""Driver-contract hygiene: the queries()/oracle_sql() dict literals
must not carry duplicate keys (a duplicate silently shadows the earlier
gate — the round-5 session-4 `decontaminate` regression), and every
oracle key must have a queries() entry."""

import ast
from pathlib import Path

ENTRY = Path(__file__).resolve().parents[1] / "__ray_entry__.py"


def test_no_duplicate_dict_keys_in_entry():
    tree = ast.parse(ENTRY.read_text())
    offenders = []
    for node in ast.walk(tree):
        if isinstance(node, ast.Dict):
            keys = [k.value for k in node.keys
                    if isinstance(k, ast.Constant) and isinstance(k.value, str)]
            dupes = {k for k in keys if keys.count(k) > 1}
            if dupes:
                offenders.append((node.lineno, sorted(dupes)))
    assert not offenders, f"duplicate dict keys: {offenders}"


def test_every_oracle_has_query(ray_session):
    import sys

    sys.path.insert(0, str(ENTRY.parent))
    import __ray_entry__ as e

    qs, sqls = e.queries(), e.oracle_sql()
    assert set(sqls) <= set(qs)
    # the only rows-only gates are the two media tensor pipelines
    assert sorted(set(qs) - set(sqls)) == [
        "media_features", "media_features_real"]
