"""The driver-gate sampling rotation (``__spark_entry__.queries()``):
keys without CURRENT green driver evidence must form the exact prefix
of the returned ordering, where "green" means a ``hash_match: true``
record in some committed CORRECTNESS round file AND the current oracle
md5 still matches the snapshot taken at that green check."""

import hashlib
import json
import os

import __spark_entry__ as entrymod

ROOT = os.path.dirname(os.path.abspath(entrymod.__file__))


def _load_state():
    green = set()
    import glob
    for p in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        with open(p) as fh:
            for k, rec in json.load(fh).items():
                if isinstance(rec, dict) and rec.get("hash_match") is True:
                    green.add(k)
    with open(os.path.join(ROOT, "tools", "oracle_green_hashes.json")) as fh:
        snapshot = json.load(fh)
    return green, snapshot


def test_unsettled_keys_are_an_exact_prefix():
    green, snapshot = _load_state()
    oracles = entrymod.oracle_sql()
    keys = list(entrymod.queries())

    def settled(k):
        sql = oracles.get(k)
        return (k in green and sql is not None
                and snapshot.get(k)
                == hashlib.md5(sql.encode()).hexdigest())

    unsettled = [k for k in keys if not settled(k)]
    assert keys[:len(unsettled)] == unsettled, (
        "rotation must front-load every key lacking current green "
        "driver evidence")


def test_failure_only_records_do_not_settle_a_key():
    """A key that only ever produced a failure/no_oracle record must
    sort into the unsettled prefix even though it APPEARS in a round
    file — the round-5 ann_lsh_topk bug."""
    green, _ = _load_state()
    appeared = set()
    import glob
    for p in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        with open(p) as fh:
            appeared |= set(json.load(fh))
    fail_only = (appeared - green) & set(entrymod.queries())
    if not fail_only:
        return  # nothing to assert against in this checkout
    # every fail-only key must precede every settled key
    keys = list(entrymod.queries())
    oracles = entrymod.oracle_sql()
    with open(os.path.join(ROOT, "tools",
                           "oracle_green_hashes.json")) as fh:
        snapshot = json.load(fh)
    settled_positions = [
        keys.index(k) for k in keys
        if k in green and oracles.get(k) is not None
        and snapshot.get(k) == hashlib.md5(
            oracles[k].encode()).hexdigest()]
    if not settled_positions:
        return  # every key unsettled: the prefix test already covers it
    for k in fail_only:
        assert keys.index(k) < min(settled_positions), k


def test_oracle_edit_requeues_a_green_key():
    """Drift simulation: a green key whose current oracle md5 mismatches
    the snapshot must become unsettled (front of queue)."""
    green, snapshot = _load_state()
    oracles = entrymod.oracle_sql()
    settled_green = [
        k for k in green
        if oracles.get(k) is not None
        and snapshot.get(k) == hashlib.md5(oracles[k].encode()).hexdigest()]
    assert settled_green, "need at least one settled green key"
    k = settled_green[0]
    # the check the rotation performs, applied to an edited string
    edited = oracles[k] + " -- drifted"
    assert snapshot.get(k) != hashlib.md5(edited.encode()).hexdigest()
