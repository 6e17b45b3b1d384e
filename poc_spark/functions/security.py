"""Credential digest — the engine counterpart of OP-FN-HASH.

Reference: bcrypt.hashpw / bcrypt.checkpw guard the login endpoints
(/root/reference/backend/main.py:135,148,181). bcrypt is a password-
storage KDF, not an analytic function (SURVEY §2.2 scoped it out of the
query engine), and the library isn't in this container — but the
reference's *contract* is reproducible with built-in JVM expressions:
per-user random salt, a fixed self-describing format string, and
verify-by-recompute. Format: ``sha256$<salt>$<hex digest>``.

This is schema/flow parity for the one reference behavior with no other
engine counterpart; it is NOT a substitute for bcrypt's adaptive cost
factor in a production auth system (a real deployment would swap the
digest core, keeping the column contract).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SCHEME = "sha256"


def new_salt() -> Column:
    """16-hex-char random salt per row (uuid-derived — the same
    entropy source the dim-table row factory uses)."""
    return F.substring(F.regexp_replace(F.expr("uuid()"), "-", ""), 1, 16)


def credential_digest(password: Column, salt: Column) -> Column:
    """'sha256$<salt>$<hex>' with digest = sha2(salt ':' password).

    `salt` is referenced twice (display + hash input), so it MUST be a
    deterministic expression or a materialized column — an inline
    nondeterministic expression like new_salt() would evaluate
    independently per reference and store a salt that never hashes
    back. Use `with_credential` for fresh random salts."""
    return F.concat_ws(
        "$",
        F.lit(_SCHEME),
        salt,
        F.sha2(F.concat(salt, F.lit(":"), password), 256),
    )


def with_credential(
    df, password_col: str, out_col: str = "credential", drop_password: bool = False
):
    """Attach 'sha256$<salt>$<digest>' with a fresh per-row random salt.

    Two projections on purpose: the nondeterministic salt materializes
    ONCE in its own projection — Catalyst's CollapseProject never merges
    across a nondeterministic expression — so the displayed salt and the
    hashed salt are the same value."""
    salted = df.withColumn("_salt", new_salt())
    out = salted.withColumn(
        out_col, credential_digest(F.col(password_col), F.col("_salt"))
    ).drop("_salt")
    return out.drop(password_col) if drop_password else out


def verify_credential(password: Column, stored: Column) -> Column:
    """True iff recomputing the digest with the stored salt reproduces
    the stored string (bcrypt.checkpw's shape). Null-safe: a malformed
    stored value yields false, never a crash (F.get, not getItem — a
    data-dependent index under ANSI would fail the job)."""
    salt = F.get(F.split(stored, r"\$"), 1)
    return credential_digest(password, salt).eqNullSafe(stored)
