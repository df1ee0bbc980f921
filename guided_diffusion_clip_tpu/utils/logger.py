"""KV logger with pluggable writers (reference logger.py, OpenAI-baselines style).

Formats: human stdout table, raw log, JSON-lines, self-amending CSV, optional
TensorBoard events (via tensorboardX if available, else skipped). Run dirs are
`{main_path}/{yymmdd_HHMMSS}_{description}` (logger.py:453). Per-process
formats via OPENAI_LOG_FORMAT / OPENAI_LOG_FORMAT_MPI with rank-suffixed
filenames (logger.py:459-466) — "rank" here is `jax.process_index()`.

`profile_kv` / `@profile` accumulate wall time into `wait_*` keys
(logger.py:293-317); on TPU pair them with jax.profiler traces for on-device
timing (SURVEY.md §5.1).
"""

from __future__ import annotations

import csv as _csv
import datetime
import functools
import json
import os
import os.path as osp
import sys
import time
from collections import defaultdict
from contextlib import contextmanager

DEBUG = 10
INFO = 20
WARN = 30
ERROR = 40
DISABLED = 50


class KVWriter:
    def writekvs(self, kvs):
        raise NotImplementedError


class SeqWriter:
    def writeseq(self, seq):
        raise NotImplementedError


class HumanOutputFormat(KVWriter, SeqWriter):
    def __init__(self, filename_or_file):
        if isinstance(filename_or_file, str):
            self.file = open(filename_or_file, "wt")
            self.own_file = True
        else:
            self.file = filename_or_file
            self.own_file = False

    def writekvs(self, kvs):
        key2str = {}
        for key, val in sorted(kvs.items()):
            valstr = f"{val:<8.3g}" if hasattr(val, "__float__") else str(val)
            key2str[self._truncate(key)] = self._truncate(valstr)
        if not key2str:
            print("WARNING: tried to write empty key-value dict")
            return
        keywidth = max(map(len, key2str.keys()))
        valwidth = max(map(len, key2str.values()))
        dashes = "-" * (keywidth + valwidth + 7)
        lines = [dashes]
        for key, val in sorted(key2str.items(), key=lambda kv: kv[0].lower()):
            lines.append(f"| {key}{' ' * (keywidth - len(key))} | {val}{' ' * (valwidth - len(val))} |")
        lines.append(dashes)
        self.file.write("\n".join(lines) + "\n")
        self.file.flush()

    def _truncate(self, s, maxlen=30):
        return s[: maxlen - 3] + "..." if len(s) > maxlen else s

    def writeseq(self, seq):
        seq = list(seq)
        for i, elem in enumerate(seq):
            self.file.write(elem)
            if i < len(seq) - 1:
                self.file.write(" ")
        self.file.write("\n")
        self.file.flush()

    def close(self):
        if self.own_file:
            self.file.close()


class JSONOutputFormat(KVWriter):
    def __init__(self, filename):
        self.file = open(filename, "wt")

    def writekvs(self, kvs):
        for k, v in sorted(kvs.items()):
            if hasattr(v, "dtype"):
                kvs[k] = float(v)
        self.file.write(json.dumps(kvs) + "\n")
        self.file.flush()

    def close(self):
        self.file.close()


class CSVOutputFormat(KVWriter):
    """CSV that rewrites its header when new keys appear (logger.py:119-143)."""

    def __init__(self, filename):
        self.filename = filename
        self.file = open(filename, "w+t")
        self.keys = []
        self.sep = ","

    def writekvs(self, kvs):
        extra_keys = list(kvs.keys() - self.keys)
        extra_keys.sort()
        if extra_keys:
            self.keys.extend(extra_keys)
            self.file.seek(0)
            lines = self.file.readlines()
            self.file.seek(0)
            self.file.write(self.sep.join(self.keys) + "\n")
            for line in lines[1:]:
                self.file.write(line[:-1] + self.sep * len(extra_keys) + "\n")
        else:
            self.file.seek(0, 2)
            if self.file.tell() == 0:
                self.file.write(self.sep.join(self.keys) + "\n")
        row = []
        for k in self.keys:
            v = kvs.get(k)
            row.append("" if v is None else str(v))
        self.file.write(self.sep.join(row) + "\n")
        self.file.flush()

    def close(self):
        self.file.close()


class TensorBoardOutputFormat(KVWriter):
    """Optional TB writer; silently no-ops if no TB backend is installed."""

    def __init__(self, logdir):
        self.writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.writer = SummaryWriter(logdir)
        except Exception:
            pass
        self.step = 0

    def writekvs(self, kvs):
        if self.writer is None:
            return
        step = int(kvs.get("step", self.step))
        for k, v in kvs.items():
            if hasattr(v, "__float__"):
                self.writer.add_scalar(k, float(v), step)
        self.writer.flush()
        self.step = step + 1

    def close(self):
        if self.writer is not None:
            self.writer.close()


def make_output_format(fmt, ev_dir, log_suffix=""):
    os.makedirs(ev_dir, exist_ok=True)
    if fmt == "stdout":
        return HumanOutputFormat(sys.stdout)
    elif fmt == "log":
        return HumanOutputFormat(osp.join(ev_dir, f"log{log_suffix}.txt"))
    elif fmt == "json":
        return JSONOutputFormat(osp.join(ev_dir, f"progress{log_suffix}.json"))
    elif fmt == "csv":
        return CSVOutputFormat(osp.join(ev_dir, f"progress{log_suffix}.csv"))
    elif fmt == "tensorboard":
        return TensorBoardOutputFormat(osp.join(ev_dir, f"tb{log_suffix}"))
    raise ValueError(f"Unknown format specified: {fmt}")


# ---------------------------------------------------------------------------
# Frontend (logger.py:212-330)
# ---------------------------------------------------------------------------


def logkv(key, val):
    get_current().logkv(key, val)


def logkv_mean(key, val):
    get_current().logkv_mean(key, val)


def logkvs(d):
    for k, v in d.items():
        logkv(k, v)


def dumpkvs():
    return get_current().dumpkvs()


def distributed_weighted_mean(name2val, name2cnt=None):
    """Cross-process weighted mean of a KV dict (reference mpi_weighted_mean,
    logger.py:412-439). Uses host all-gather; single-process is a no-op."""
    import jax

    if jax.process_count() <= 1:
        return dict(name2val)
    import numpy as np
    from jax.experimental import multihost_utils

    keys = sorted(name2val.keys())
    vals = np.array([float(name2val[k]) for k in keys], np.float64)
    cnts = np.array([float((name2cnt or {}).get(k, 1)) for k in keys], np.float64)
    gv = multihost_utils.process_allgather(vals)
    gc = multihost_utils.process_allgather(cnts)
    out = {}
    for i, k in enumerate(keys):
        total = gc[:, i].sum()
        out[k] = float((gv[:, i] * gc[:, i]).sum() / max(total, 1e-12))
    return out


def getkvs():
    return get_current().name2val


def log(*args, level=INFO):
    get_current().log(*args, level=level)


def debug(*args):
    log(*args, level=DEBUG)


def info(*args):
    log(*args, level=INFO)


def warn(*args):
    log(*args, level=WARN)


def error(*args):
    log(*args, level=ERROR)


def set_level(level):
    get_current().set_level(level)


def get_dir():
    return get_current().get_dir()


record_tabular = logkv
dump_tabular = dumpkvs


@contextmanager
def profile_kv(scopename):
    logkey = "wait_" + scopename
    tstart = time.time()
    try:
        yield
    finally:
        get_current().name2val[logkey] += time.time() - tstart


def profile(n):
    def decorator_with_name(func):
        @functools.wraps(func)
        def func_wrapper(*args, **kwargs):
            with profile_kv(n):
                return func(*args, **kwargs)

        return func_wrapper

    return decorator_with_name


# ---------------------------------------------------------------------------
# Backend
# ---------------------------------------------------------------------------


class Logger:
    DEFAULT = None
    CURRENT = None

    def __init__(self, dir, output_formats):
        self.name2val = defaultdict(float)
        self.name2cnt = defaultdict(int)
        self.level = INFO
        self.dir = dir
        self.output_formats = output_formats

    def logkv(self, key, val):
        self.name2val[key] = val

    def logkv_mean(self, key, val):
        oldval, cnt = self.name2val[key], self.name2cnt[key]
        self.name2val[key] = oldval * cnt / (cnt + 1) + val / (cnt + 1)
        self.name2cnt[key] = cnt + 1

    def dumpkvs(self):
        if self.level == DISABLED:
            return {}
        out = self.name2val.copy()
        for fmt in self.output_formats:
            if isinstance(fmt, KVWriter):
                fmt.writekvs(self.name2val)
        self.name2val.clear()
        self.name2cnt.clear()
        return out

    def log(self, *args, level=INFO):
        if self.level <= level:
            self._do_log(args)

    def set_level(self, level):
        self.level = level

    def get_dir(self):
        return self.dir

    def close(self):
        for fmt in self.output_formats:
            fmt.close()

    def _do_log(self, args):
        for fmt in self.output_formats:
            if isinstance(fmt, SeqWriter):
                fmt.writeseq(map(str, args))


def get_current():
    if Logger.CURRENT is None:
        _configure_default_logger()
    return Logger.CURRENT


def _configure_default_logger():
    configure_dir()
    Logger.DEFAULT = Logger.CURRENT


def configure_dir(dir=None, format_strs=None, log_suffix=""):
    if dir is None:
        dir = os.getenv("OPENAI_LOGDIR")
    if dir is None:
        dir = osp.join(
            "/tmp", datetime.datetime.now().strftime("openai-%Y-%m-%d-%H-%M-%S-%f")
        )
    assert isinstance(dir, str)
    dir = os.path.expanduser(dir)
    os.makedirs(os.path.expanduser(dir), exist_ok=True)

    import jax

    rank = jax.process_index()
    if log_suffix == "" and rank > 0:
        log_suffix = "-rank%03i" % rank
    if format_strs is None:
        if rank == 0:
            format_strs = os.getenv("OPENAI_LOG_FORMAT", "stdout,log,csv").split(",")
        else:
            format_strs = os.getenv("OPENAI_LOG_FORMAT_MPI", "log").split(",")
    format_strs = filter(None, format_strs)
    output_formats = [make_output_format(f, dir, log_suffix) for f in format_strs]

    Logger.CURRENT = Logger(dir=dir, output_formats=output_formats)
    if output_formats:
        log("Logging to %s" % dir)
    return dir


def configure(args=None, **kwargs):
    """Fork-style configure: build `{main_path}/{yymmdd_HHMMSS}_{description}`
    (logger.py:442-466). Falls back to env-driven defaults when args is None."""
    if args is None or not getattr(args, "main_path", None):
        return configure_dir(**kwargs)
    stamp = datetime.datetime.now().strftime("%y%m%d_%H%M%S")
    desc = getattr(args, "description", "") or ""
    name = f"{stamp}_{desc}" if desc else stamp
    run_dir = osp.join(args.main_path, name)
    return configure_dir(dir=run_dir, **kwargs)


def reset():
    if Logger.CURRENT is not Logger.DEFAULT:
        Logger.CURRENT.close()
        Logger.CURRENT = Logger.DEFAULT
        log("Reset logger")


@contextmanager
def scoped_configure(dir=None, format_strs=None):
    prevlogger = Logger.CURRENT
    configure_dir(dir=dir, format_strs=format_strs)
    try:
        yield
    finally:
        Logger.CURRENT.close()
        Logger.CURRENT = prevlogger
