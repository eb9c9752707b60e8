"""Config pass-through (SURVEY.md §2.5 C4).

The reference lets runtime arguments prefixed ``source.connector.``
override connector configuration (delta-plugins-common/.../
RuntimeArguments.java:37-45; applied at mysql/MySqlEventReader.java:135-138).
Our pipeline applies the same convention to its own knobs.
"""

from __future__ import annotations

CONNECTOR_PREFIX = "source.connector."


def extract_prefixed(args: dict[str, str], prefix: str = CONNECTOR_PREFIX) -> dict[str, str]:
    """Return {suffix: value} for every key starting with prefix."""
    return {k[len(prefix):]: v for k, v in args.items() if k.startswith(prefix) and len(k) > len(prefix)}


def merge_pipeline_config(defaults: dict, runtime_args: dict[str, str],
                          prefix: str = CONNECTOR_PREFIX) -> dict:
    """Defaults overridden by prefixed runtime args (values parsed to the
    default's type when possible)."""
    out = dict(defaults)
    for k, v in extract_prefixed(runtime_args, prefix).items():
        if k in out and isinstance(out[k], bool):
            out[k] = str(v).lower() in ("1", "true", "yes")
        elif k in out and isinstance(out[k], int):
            out[k] = int(v)
        else:
            out[k] = v
    return out


class job_desc:
    """Context manager labeling the Spark jobs an action block launches
    (shows up in event logs / UIs / the stage profiler — the C3
    observability story at the job level). No-op overhead: one py4j call
    each way."""

    def __init__(self, spark, desc: str):
        self.sc = spark.sparkContext
        self.desc = desc

    def __enter__(self):
        self.sc.setJobDescription(self.desc)
        return self

    def __exit__(self, *exc):
        self.sc.setJobDescription(None)
        return False
