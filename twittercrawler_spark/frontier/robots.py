"""robots.txt parsing: raw fetched bodies → the engine's robots rules table.

The crawl previously consumed a pre-built (host, disallow_prefix,
crawl_delay) dimension (frontier/crawl.py robots gate); a real crawl has to
derive that table from fetched robots.txt text. This module does the
derivation — user-agent section selection, allow/disallow rule collection,
crawl-delay — and supplies the longest-match precedence gate for rule sets
that contain Allow exceptions.

One normative spec, two implementations (the crawl module's own pattern):
:func:`rules_allow` is the pure-Python twin of the DataFrame gate in
:func:`robots_gate`; parity tests assert they agree on generated
rule/path matrices including precedence conflicts.

Semantics (REP, RFC 9309 + the de-facto Google spec — public knowledge):
* lines are ``field: value`` with ``#`` comments; fields case-insensitive;
* consecutive ``User-agent`` lines open a group; ``Allow``/``Disallow``/
  ``Crawl-delay`` lines belong to the open group(s);
* a crawler obeys the MOST SPECIFIC matching group only: exact-agent groups
  (longest agent-token substring match) beat ``*`` groups;
* rule precedence per path: the longest matching rule prefix wins; on a
  length tie the least restrictive (Allow) rule wins; no match ⇒ allowed;
* an empty ``Disallow:`` value means "no restriction" (rule dropped);
* rules containing the ``*``/``$`` wildcard extensions are out of scope and
  skipped with a flag (``n_wildcard`` in the parse stats) — a documented
  seam, not silent data loss.

Scale: robots bodies are a per-host dimension (one row per host). Parsing is
one Arrow-batched crossing (mapInPandas), the output rules table is
dimension-sized and broadcast by every consumer — the same shape the gate
already used.

Reference analog (master-exclusion pinning, P6):
pages/Postprocess_scripts/Stance_Detection.py:57-61.
"""

from __future__ import annotations

from typing import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

RULES_SCHEMA = (
    "host string, prefix string, allow boolean, crawl_delay int"
)

DEFAULT_AGENT = "twittercrawler-spark"


def parse_robots_body(
    host: str, body: str, agent: str = DEFAULT_AGENT
) -> tuple[list[tuple[str, str, bool, int | None]], int]:
    """Parse ONE robots.txt body → ([(host, prefix, allow, crawl_delay)],
    n_wildcard_skipped). Pure Python; the vectorized reader and the parity
    twin both call this, so there is exactly one parser."""
    agent_l = agent.lower()
    # groups: list of (agent_tokens, rules, crawl_delay)
    groups: list[dict] = []
    open_group: dict | None = None
    collecting_agents = False
    for raw_line in body.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line:
            continue
        field, sep, value = line.partition(":")
        if not sep:
            continue  # malformed line: skip (S4 discipline)
        field = field.strip().lower()
        value = value.strip()
        if field == "user-agent":
            if not collecting_agents:
                open_group = {"agents": [], "rules": [], "delay": None}
                groups.append(open_group)
                collecting_agents = True
            open_group["agents"].append(value.lower())
            continue
        collecting_agents = False
        if open_group is None:
            continue  # rules before any User-agent line: skip
        if field in ("allow", "disallow"):
            open_group["rules"].append((field == "allow", value))
        elif field == "crawl-delay":
            try:
                open_group["delay"] = int(float(value))
            except ValueError:
                pass

    # group selection: most specific agent match only; '*' is the fallback
    def specificity(g: dict) -> int:
        best = -1
        for tok in g["agents"]:
            if tok == "*":
                best = max(best, 0)
            elif tok and tok in agent_l:
                best = max(best, len(tok))
        return best

    scored = [(specificity(g), i, g) for i, g in enumerate(groups)]
    matched = [s for s in scored if s[0] >= 0]
    if not matched:
        return [], 0
    top = max(s[0] for s in matched)
    chosen = [g for s, _, g in matched if s == top]

    out: list[tuple[str, str, bool, int | None]] = []
    n_wild = 0
    for g in chosen:
        delay = g["delay"]
        any_rule = False
        for allow, value in g["rules"]:
            if value == "":
                if not allow:
                    continue  # empty Disallow = no restriction
                continue  # empty Allow carries no information either
            if "*" in value or "$" in value:
                n_wild += 1
                continue
            out.append((host, value, allow, delay))
            any_rule = True
        if not any_rule and delay is not None:
            # delay-only group still matters for politeness quotas
            out.append((host, "", True, delay))
    return out, n_wild


def parse_robots(bodies: DataFrame, agent: str = DEFAULT_AGENT) -> DataFrame:
    """(host, body) → rules table (RULES_SCHEMA) via one Arrow crossing.

    ``body`` may be string or binary (fetched bytes decode as UTF-8 with
    replacement — robots.txt is ASCII in practice)."""
    import pandas as pd

    def _parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        cols = ["host", "prefix", "allow", "crawl_delay"]
        for pdf in batches:
            rows: list[tuple] = []
            for host, body in zip(pdf["host"], pdf["body"]):
                if body is None:
                    continue
                if isinstance(body, (bytes, bytearray)):
                    body = bytes(body).decode("utf-8", "replace")
                parsed, _ = parse_robots_body(host, body, agent)
                rows.extend(parsed)
            yield pd.DataFrame(rows, columns=cols)

    return bodies.select("host", "body").mapInPandas(_parse, RULES_SCHEMA)


def compile_robots(rules: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a rules table for the crawl's consumers.

    Returns ``(disallow_table, conflicts)``:

    * ``disallow_table`` — (host, disallow_prefix, crawl_delay), the shape
      frontier/crawl.py's anti-join gate and crawl-delay quota path consume.
      EXACT precedence-equivalent iff ``conflicts`` is empty.
    * ``conflicts`` — (host, allow_prefix, disallow_prefix) pairs where an
      Allow rule extends a Disallow prefix: such exceptions cannot be
      expressed as a pure disallow-prefix set; feed the FULL rules table to
      the precedence gate (run_round does this when the robots table has an
      ``allow`` column) instead of the compiled one.
    """
    dis = rules.filter(~F.col("allow") & (F.col("prefix") != "")).select(
        "host",
        F.col("prefix").alias("disallow_prefix"),
        F.coalesce("crawl_delay", F.lit(0)).alias("crawl_delay"),
    )
    al = rules.filter(F.col("allow") & (F.col("prefix") != "")).select(
        "host", F.col("prefix").alias("allow_prefix")
    )
    conflicts = dis.join(al, "host").filter(
        F.col("allow_prefix").startswith(F.col("disallow_prefix"))
    ).select("host", "allow_prefix", "disallow_prefix")
    # hosts with a delay but no disallow rules still need a quota row
    delay_only = (
        rules.filter(F.coalesce("crawl_delay", F.lit(0)) > 0)
        .join(dis.select("host").distinct(), "host", "left_anti")
        .groupBy("host")
        .agg(F.max("crawl_delay").alias("crawl_delay"))
        .select("host", F.lit(None).cast("string").alias("disallow_prefix"),
                "crawl_delay")
    )
    return dis.unionByName(delay_only), conflicts


def robots_gate(candidates: DataFrame, rules: DataFrame) -> DataFrame:
    """Longest-match precedence gate: the ``candidates`` rows ALLOWED under
    ``rules`` (RULES_SCHEMA). ``candidates`` needs (host, path) columns.

    Plan shape — MAP-ONLY over the candidates: rules pre-aggregate to one
    array of (prefix, allow) structs per host (dimension-sized, broadcast,
    the same budget the disallow anti-join gate already assumes), the
    candidates broadcast-join on host, and the per-path argmax — longest
    rule wins, Allow wins length ties, no match ⇒ allowed — is a JVM
    higher-order fold over that array. The frontier never shuffles for the
    gate at any scale.
    """
    host_rules = (
        rules.filter(F.col("prefix") != "")
        .groupBy("host")
        .agg(
            F.collect_list(
                F.struct(F.col("prefix"), F.col("allow").cast("int").alias("a"))
            ).alias("_rl")
        )
    )
    c = candidates.join(F.broadcast(host_rules), "host", "left")
    matched = F.filter(
        F.col("_rl"), lambda r: F.col("path").startswith(r["prefix"])
    )
    init = F.struct(F.lit(-1).alias("l"), F.lit(1).alias("a"))
    best = F.aggregate(
        matched,
        init,
        lambda acc, r: F.when(
            (F.length(r["prefix"]) > acc["l"])
            | ((F.length(r["prefix"]) == acc["l"]) & (r["a"] > acc["a"])),
            F.struct(F.length(r["prefix"]).alias("l"), r["a"].alias("a")),
        ).otherwise(acc),
    )
    return (
        c.withColumn("_b", F.when(F.col("_rl").isNull(), init).otherwise(best))
        .filter(F.col("_b.a") == 1)
        .drop("_rl", "_b")
    )


def rules_allow(
    rules: list[tuple[str, str, bool]], host: str, path: str
) -> bool:
    """Pure-Python precedence twin of :func:`robots_gate`:
    True iff (host, path) is allowed under [(host, prefix, allow)]."""
    best: tuple[int, int] | None = None
    for rh, prefix, allow in rules:
        if rh != host or not prefix or not path.startswith(prefix):
            continue
        key = (len(prefix), 1 if allow else 0)
        if best is None or key > best:
            best = key
    return best is None or best[1] == 1
