"""Config file + hot-reload loop (SURVEY.md M4).

The reference watches its YAML config with fsnotify (+ SIGHUP) and, on
change, stops every config-dependent object, recreates them, and reruns
(/root/reference/config/watch.go:19-79, consumed cmd/yadex.go:59-77).
The Spark analogue: the driver polls the config file between drain
rounds (and accepts SIGHUP to force a re-read), and on change rebuilds
the Router/CdcPipeline against the SAME checkpoint — Structured
Streaming's offset log plus the lake's idempotent batch ids make the
recreate-and-rerun safe (no replayed epoch can double-apply).

Config format (JSON; the reference's config.DataSync knobs that the
engine consumes — /root/reference/config/config.go:19,26-54):

    {"patterns":    [{"regex": "seqs.*", "exclude": ["seqs_tmp.*"]}],
     "rt_patterns": [{"regex": "rt_.*", "expires_ms": 5000}],
     "max_files_per_trigger": 8,
     "compact_every": 16,
     "minicompact_every": 4,
     "delay_ms": 1000}

Default-filling and constraint repair mirror config.go:100-112 /
config_test.go:15-146: missing expires_ms on an RT pattern gets the
reference's 5000 default; expires_ms must exceed delay_ms (the
reference repairs Delay >= Expires by raising Expires).
"""

from __future__ import annotations

import json
import os
import signal
import time
from dataclasses import dataclass, field

from yadex_spark.operators.route import RT, ST, RoutePattern, Router

DEFAULT_EXPIRES_MS = 5_000  # config.go:19


@dataclass(frozen=True)
class PipelineConfig:
    patterns: tuple[RoutePattern, ...]
    max_files_per_trigger: int = 8
    compact_every: int = 0  # full maintenance cadence in drain ROUNDS (0 = never)
    #: cheap-tier cadence: maintain_minor() every N rounds — O(trailing
    #: small deltas), so it can run far more often than compact_every
    #: (the LSM minor/major compaction split)
    minicompact_every: int = 0
    delay_ms: int = 1_000  # poll cadence between drain rounds (Delay)

    def router(self) -> Router:
        return Router(patterns=self.patterns)


def load_config(path: str) -> PipelineConfig:
    """Parse + default-fill + constraint-repair (config.go:100-112)."""
    with open(path) as f:
        raw = json.load(f)
    delay_ms = int(raw.get("delay_ms", 1_000))
    pats: list[RoutePattern] = []
    for p in raw.get("rt_patterns", []):
        expires = int(p.get("expires_ms", DEFAULT_EXPIRES_MS))
        if expires <= delay_ms:
            # the reference repairs Delay >= Expires rather than failing
            expires = delay_ms + DEFAULT_EXPIRES_MS
        pats.append(
            RoutePattern(p["regex"], RT, exclude=tuple(p.get("exclude", ())),
                         expires_ms=expires, expect=p.get("expect"))
        )
    # catch-all default ONLY when no pattern key is present at all: an
    # RT-only config must not silently sync every non-RT table losslessly
    # — in the reference, collections matching no configured pattern are
    # not synced (msync/match.go findEntry returns nil)
    default_st = [{"regex": ".*"}] if ("patterns" not in raw and "rt_patterns" not in raw) else []
    for p in raw.get("patterns", default_st):
        pats.append(RoutePattern(p["regex"], ST, exclude=tuple(p.get("exclude", ())),
                                 expect=p.get("expect")))
    return PipelineConfig(
        patterns=tuple(pats),
        max_files_per_trigger=int(raw.get("max_files_per_trigger", 8)),
        compact_every=int(raw.get("compact_every", 0)),
        minicompact_every=int(raw.get("minicompact_every", 0)),
        delay_ms=delay_ms,
    )


@dataclass
class ConfigWatcher:
    """Change detector: file mtime polling + SIGHUP (watch.go semantics
    minus fsnotify — the driver has no event loop to park a watcher on,
    and a between-rounds poll is the same freshness at drain cadence)."""
    path: str
    _mtime: float = field(default=-1.0)
    _hup: bool = field(default=False)

    def install_sighup(self) -> None:
        signal.signal(signal.SIGHUP, lambda *_: setattr(self, "_hup", True))

    def changed(self) -> bool:
        hup, self._hup = self._hup, False
        try:
            m = os.stat(self.path).st_mtime
        except FileNotFoundError:
            return hup
        if m != self._mtime:
            self._mtime = m
            return True
        return hup


def run_with_reload(
    spark,
    config_path: str,
    oplog_dir: str,
    lake_dir: str,
    checkpoint_dir: str,
    max_rounds: int | None = None,
    timeout_s: int = 3600,
    sighup: bool = False,
) -> int:
    """Drive the pipeline in drain rounds, re-reading the config between
    rounds when it changed (stop → recreate → rerun, cmd/yadex.go:59-77).
    Returns the number of rounds run.  ``max_rounds=None`` runs forever
    (production); tests pass a bound.
    """
    from yadex_spark.streaming.pipeline import CdcPipeline

    watcher = ConfigWatcher(config_path)
    if sighup:
        watcher.install_sighup()  # SIGHUP forces a re-read (watch.go:60-64)
    cfg = load_config(config_path)
    watcher.changed()  # prime the mtime
    pipe = None
    rounds = 0
    while max_rounds is None or rounds < max_rounds:
        if pipe is None or watcher.changed():
            cfg = load_config(config_path)
            # recreate the config-dependent objects; same checkpoint +
            # scoped batch ids keep exactly-once across the swap
            pipe = CdcPipeline(
                spark, oplog_dir, lake_dir, checkpoint_dir,
                router=cfg.router(),
                max_files_per_trigger=cfg.max_files_per_trigger,
                compact_every=cfg.compact_every,
            )
        pipe.run_available_now(timeout_s=timeout_s)
        rounds += 1
        if cfg.compact_every and rounds % cfg.compact_every == 0:
            # out-of-band maintenance between drain rounds: the stream
            # is stopped here, so compact/vacuum never stall an epoch
            # (the reference never blocks its apply path on maintenance)
            pipe.maintain()
        elif cfg.minicompact_every and rounds % cfg.minicompact_every == 0:
            # cheap tier on the rounds full maintenance doesn't run:
            # fold the trailing small deltas so read amplification stays
            # flat between (much rarer) full compactions
            pipe.maintain_minor()
        if max_rounds is None or rounds < max_rounds:
            _sleep_between_rounds(cfg)
    return rounds


def _sleep_between_rounds(cfg: PipelineConfig) -> None:
    """Drain cadence (Delay).  A seam: tests patch this to inject the
    'config changed while running' moment deterministically."""
    time.sleep(cfg.delay_ms / 1000.0)
