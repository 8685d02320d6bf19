"""Independent pure-Python simulator of the pq evaluation semantics.

A second, from-scratch implementation (plain dicts/lists, no Spark) of the
semantics documented in SURVEY.md §2.4-2.7 — used by the property tests to
cross-check the DataFrame planner on randomized inputs. Deliberately
structured differently from both the reference (iterator pull) and the
engine (DataFrame plans): it materializes everything eagerly.
"""

from __future__ import annotations

import math
import re

F64_EPSILON = 2.220446049250313e-16
NAME = "__name__"


def sig_of(labels: dict) -> str:
    return "".join(f"{k}\xff{v}" for k, v in sorted(labels.items()))


class Sim:
    def __init__(self, samples, interval, lookback, since=None):
        # samples: list of (seq, ts, labels incl __name__, value), ts ms
        self.samples = sorted(samples, key=lambda s: (s[1], s[0]))
        self.interval = interval
        self.lookback = lookback
        self.since = since

    # ---- selectors -------------------------------------------------------

    def _matches(self, labels, matchers):
        for (k, op, v) in matchers:
            lv = labels.get(k)
            if lv is None:
                return False
            if op == "=" and lv != v:
                return False
            if op == "!=" and lv == v:
                return False
            if op == "=~" and re.match(f"^(?:{v})$", lv) is None:
                return False
            if op == "!~" and re.match(f"^(?:{v})$", lv) is not None:
                return False
        return True

    def selector(self, matchers, duration=None, offset=0, at=None):
        """Returns (grid, cells): grid = [instants]; cells = {instant:
        [(labels, value)...] sig-ordered} for instant vectors, or window
        point lists for range vectors. ``offset`` (ms) evaluates the
        selector that far in the past: samples shift forward by the
        offset BEFORE the grid anchor is derived, matching the engine's
        extension semantics (planner._selector_parts). ``at`` (ms) pins
        the window to one fixed instant (PromQL ``@``): every grid
        instant sees the fixed window's result (planner._at_fixed)."""
        lb = duration if duration is not None else self.lookback
        matched = [s for s in self.samples if self._matches(s[2], matchers)]
        if offset:
            matched = [(seq, ts + offset, labels, value)
                       for (seq, ts, labels, value) in matched]
        if not matched:
            return [], {}
        tsmin = min(s[1] for s in matched)
        tsmax = max(s[1] for s in matched)
        anchor = self.since if self.since is not None else tsmin
        t0 = anchor + min(lb, self.interval) - 1
        if tsmax + lb - 1 < t0:
            return [], {}
        kend = (tsmax + lb - 1 - t0) // self.interval
        grid = [t0 + k * self.interval for k in range(kend + 1)]

        def window_out(wt):
            per_series = {}
            for (seq, ts, labels, value) in matched:
                if wt - lb < ts <= wt:
                    per_series.setdefault(sig_of(labels), []).append(
                        (ts, seq, labels, value)
                    )
            out = []
            for sg in sorted(per_series):
                pts = sorted(per_series[sg], key=lambda p: (p[0], p[1]))
                if duration is None:
                    ts_, seq_, labels_, value_ = pts[-1]
                    out.append((labels_, value_))
                else:
                    out.append((pts[0][2], [(p[0], p[1], p[3]) for p in pts]))
            return out

        if at is not None:
            fixed = window_out(at)
            return grid, ({t: fixed for t in grid} if fixed else {})

        cells = {}
        for t in grid:
            out = window_out(t)
            if out:
                cells[t] = out
        return grid, cells

    # ---- aggregation ------------------------------------------------------

    @staticmethod
    def _group_labels(labels, modifier):
        if modifier is None:
            return {}
        kind, names = modifier
        if kind == "by":
            return {k: v for k, v in labels.items() if k != NAME and k in names}
        return {k: v for k, v in labels.items() if k != NAME and k not in names}

    def aggregate(self, op, frame, modifier=None, arg=None):
        grid, cells = frame
        out_cells = {}
        for t, samples in cells.items():
            groups = {}
            order = []
            for labels, value in samples:
                gl = self._group_labels(labels, modifier)
                gs = sig_of(gl)
                if gs not in groups:
                    groups[gs] = (gl, [])
                    order.append(gs)
                groups[gs][1].append(value)
            out = []
            for gs in sorted(groups):
                gl, vals = groups[gs]
                if op == "sum":
                    v = math.fsum(vals) if False else sum(vals)
                elif op == "min":
                    v = min(vals)
                elif op == "max":
                    v = max(vals)
                elif op == "avg":
                    v = sum(vals) / len(vals)
                elif op == "count":
                    v = vals[0] + (len(vals) - 1)  # pq seeding quirk
                elif op == "group":
                    v = 1.0 if len(vals) > 1 else vals[0]
                else:
                    raise NotImplementedError(op)
                out.append((gl, float(v)))
            if out or True:
                out_cells[t] = out
        return grid, {t: v for t, v in out_cells.items() if v}

    # ---- over-time functions ---------------------------------------------

    def over_time(self, fn, frame):
        grid, cells = frame
        out_cells = {}
        for t, series in cells.items():
            out = []
            for labels, pts in series:  # pts: [(ts, seq, value)] asc
                vals = [p[2] for p in pts]
                if fn == "count_over_time":
                    v = float(len(vals))
                elif fn == "sum_over_time":
                    v = sum(vals)
                elif fn == "min_over_time":
                    v = min(vals)
                elif fn == "max_over_time":
                    v = max(vals)
                elif fn == "avg_over_time":
                    v = sum(vals) / len(vals)
                elif fn == "last_over_time":
                    v = vals[0]  # pq oldest-point quirk
                else:
                    raise NotImplementedError(fn)
                out.append(({k: lv for k, lv in labels.items() if k != NAME}, float(v)))
            if out:
                out_cells[t] = out
        return grid, out_cells

    # ---- binary -----------------------------------------------------------

    @staticmethod
    def _scalar_op(op, a, b):
        if op == "+":
            return a + b
        if op == "-":
            return a - b
        if op == "*":
            return a * b
        if op == "/":
            if b == 0:
                return math.inf if a > 0 else (-math.inf if a < 0 else math.nan)
            return a / b
        if op == "%":
            return math.fmod(a, b) if b != 0 else math.nan
        if op == "^":
            return math.pow(a, b)
        if op == "==":
            return float(abs(a - b) < F64_EPSILON)
        if op == "!=":
            return float(abs(a - b) > F64_EPSILON)
        if op == ">":
            return float(a > b)
        if op == ">=":
            return float(a >= b)
        if op == "<":
            return float(a < b)
        if op == "<=":
            return float(a <= b)
        raise NotImplementedError(op)

    def vector_scalar(self, op, frame, scalar, scalar_on_left, bool_mod):
        grid, cells = frame
        comparison = op in ("==", "!=", ">", ">=", "<", "<=")
        keep_name = comparison and not bool_mod
        out_cells = {}
        for t, series in cells.items():
            out = []
            for labels, v in series:
                a, b = (scalar, v) if scalar_on_left else (v, scalar)
                r = self._scalar_op(op, a, b)
                if comparison and not bool_mod:
                    if r == 0.0:
                        continue
                    r = v  # keeps the vector side's value
                nl = labels if keep_name else {
                    k: lv for k, lv in labels.items() if k != NAME
                }
                out.append((nl, float(r)))
            if out:
                out_cells[t] = out
        return grid, out_cells

    @staticmethod
    def _match_labels(labels, matching):
        if matching is None:
            return {k: v for k, v in labels.items() if k != NAME}
        kind, names = matching
        if kind == "on":
            return {k: v for k, v in labels.items() if k != NAME and k in names}
        return {k: v for k, v in labels.items() if k != NAME and k not in names}

    def vector_vector(self, op, lframe, rframe, matching=None, bool_mod=False):
        lgrid, lcells = lframe
        rgrid, rcells = rframe
        if not lgrid or not rgrid:
            return [], {}
        cutoff = min(max(lgrid), max(rgrid))
        grid = sorted(set(lgrid) | set(rgrid))
        grid = [t for t in grid if t <= cutoff]
        comparison = op in ("==", "!=", ">", ">=", "<", "<=")
        keep_name = comparison and not bool_mod
        out_cells = {}
        for t in grid:
            if t not in lcells or t not in rcells:
                continue
            rhs = {}
            for labels, v in rcells[t]:
                ms = sig_of(self._match_labels(labels, matching))
                if ms in rhs:
                    raise ValueError("duplicate series")
                rhs[ms] = v
            out = []
            seen = set()
            for labels, lv in lcells[t]:
                ml = self._match_labels(labels, matching)
                ms = sig_of(ml)
                if ms not in rhs:
                    continue
                r = self._scalar_op(op, lv, rhs[ms])
                if comparison and not bool_mod:
                    if r == 0.0:
                        continue
                    r = lv
                if ms in seen:
                    raise ValueError("many-to-one")
                seen.add(ms)
                nl = dict(ml)
                if keep_name and NAME in labels:
                    nl[NAME] = labels[NAME]
                out.append((nl, float(r)))
            if out:
                out_cells[t] = out
        return grid, out_cells

    def unary_minus(self, frame):
        grid, cells = frame
        return grid, {
            t: [(labels, -v) for labels, v in series] for t, series in cells.items()
        }


# ---- extension operators (reference parses these; engine implements) ------


class SimExt(Sim):
    """Extension-operator semantics (engine's extensions=True surface).

    topk tie note: the reference's within-group BinaryHeap retains an
    UNSPECIFIED element among equal boundary values (heap array order);
    neither its tests nor the goldens pin it. The sim mirrors the engine's
    deterministic choice — keep the earliest series in input-emission
    order — which is one valid refinement of the unspecified behavior.
    """

    def subquery(self, inner, range_ms, step=None, offset=0, at=None):
        """PromQL subquery ``expr[range:step]`` (engine's _plan_subquery):
        ``inner`` is a callable (sub_sim) -> (grid, cells) evaluating the
        inner INSTANT-vector expression on a sub-simulator whose interval
        is the step; each inner (instant, series, value) point then
        becomes a window point of the outer range vector — windows
        (t − range, t] over the engine's standard grid rule, anchored by
        the inner sample stream. ``at`` pins the outer window."""
        step = step if step is not None else self.interval
        sub = type(self)(self.samples, step, self.lookback, self.since)
        igrid, icells = inner(sub)
        pts = []  # (ts, labels, value) — ts is the (offset-shifted) instant
        for t in igrid:
            for labels, v in icells.get(t, []):
                pts.append((t + offset, labels, v))
        if not pts:
            return [], {}
        tsmax = max(p[0] for p in pts)
        anchor = self.since if self.since is not None else min(p[0] for p in pts)
        t0 = anchor + min(range_ms, self.interval) - 1
        if tsmax + range_ms - 1 < t0:
            return [], {}
        kend = (tsmax + range_ms - 1 - t0) // self.interval
        grid = [t0 + k * self.interval for k in range(kend + 1)]

        def window_out(wt):
            per = {}
            for (ts, labels, v) in pts:
                if wt - range_ms < ts <= wt:
                    per.setdefault(sig_of(labels), []).append((ts, labels, v))
            out = []
            for sg in sorted(per):
                pl = sorted(per[sg], key=lambda p: p[0])  # seq ≡ 0
                out.append((pl[0][1], [(p[0], 0, p[2]) for p in pl]))
            return out

        if at is not None:
            fixed = window_out(at)
            return grid, ({t: fixed for t in grid} if fixed else {})
        cells = {}
        for t in grid:
            out = window_out(t)
            if out:
                cells[t] = out
        return grid, cells

    def math_fn(self, name, frame):
        """Elementwise math functions (IEEE-exact subset), Prometheus
        semantics: metric name dropped; ceil/floor/round pass NaN/±Inf and
        |v| ≥ 2^52 through unchanged; round is half-UP (floor(v+0.5));
        sqrt(<0) = NaN."""
        def f(v):
            if name == "abs":
                return abs(v)
            if name == "sgn":
                return v if math.isnan(v) else float((v > 0) - (v < 0))
            if name == "sqrt":
                return float("nan") if v < 0 else math.sqrt(v)
            # int-ish: pass through when not representable as a changed int
            if math.isnan(v) or math.isinf(v) or abs(v) >= 2.0 ** 52:
                return v
            if name == "ceil":
                return float(math.ceil(v))
            if name == "floor":
                return float(math.floor(v))
            return float(math.floor(v + 0.5))  # round

        grid, cells = frame
        out = {}
        for t, series in cells.items():
            out[t] = [
                ({k: x for k, x in labels.items() if k != NAME}, f(v))
                for labels, v in series
            ]
        return grid, out

    @staticmethod
    def _civil_from_days(z: int):
        """Proleptic-Gregorian (year, month, day) from days since
        1970-01-01 (Howard Hinnant's public civil_from_days algorithm) —
        pure integer arithmetic so negative/huge epochs match Spark's
        java.time exactly where Python's datetime (year ≥ 1) cannot."""
        z += 719468
        # Python // already floors (the C++ original's `z - 146096` branch
        # compensates for truncating division — applying it here would
        # double-correct negative eras)
        era = z // 146097
        doe = z - era * 146097
        yoe = (doe - doe // 1460 + doe // 36524 - doe // 146096) // 365
        y = yoe + era * 400
        doy = doe - (365 * yoe + yoe // 4 - yoe // 100)
        mp = (5 * doy + 2) // 153
        d = doy - (153 * mp + 2) // 5 + 1
        m = mp + 3 if mp < 10 else mp - 9
        return y + (1 if m <= 2 else 0), m, d

    def calendar_fn(self, name, frame):
        """Prometheus calendar functions (engine extensions): read the
        VALUE as epoch seconds UTC, truncate toward zero; NaN for NaN/±Inf
        or |v| ≥ 1e11 (the engine's ANSI-total long-cast guard); metric
        name dropped. Sunday = 0 for day_of_week."""

        def f(v):
            if math.isnan(v) or math.isinf(v) or abs(v) >= 1e11:
                return float("nan")
            secs = math.floor(v) if v >= 0 else math.ceil(v)
            days, sod = divmod(secs, 86_400)  # Python divmod floors
            if name == "minute":
                return float((sod // 60) % 60)
            if name == "hour":
                return float(sod // 3_600)
            if name == "day_of_week":
                return float((days + 4) % 7)  # 1970-01-01 = Thursday = 4
            y, m, d = self._civil_from_days(days)
            if name == "day_of_month":
                return float(d)
            if name == "month":
                return float(m)
            if name == "year":
                return float(y)
            leap = y % 4 == 0 and (y % 100 != 0 or y % 400 == 0)
            dim = (31, 29 if leap else 28, 31, 30, 31, 30,
                   31, 31, 30, 31, 30, 31)
            if name == "days_in_month":
                return float(dim[m - 1])
            if name == "day_of_year":
                return float(sum(dim[: m - 1]) + d)
            raise AssertionError(name)

        grid, cells = frame
        out = {}
        for t, series in cells.items():
            out[t] = [
                ({k: x for k, x in labels.items() if k != NAME}, f(v))
                for labels, v in series
            ]
        return grid, out

    def timestamp(self, matchers):
        """Prometheus ``timestamp(v)``: value := ts/1000 substituted on
        the sample source BEFORE the selector runs (the engine's source
        substitution), metric name dropped."""
        saved = self.samples
        self.samples = [
            (seq, ts, labels, ts / 1000.0)
            for (seq, ts, labels, _v) in saved
        ]
        try:
            grid, cells = self.selector(matchers)
        finally:
            self.samples = saved
        out = {
            t: [
                ({k: x for k, x in labels.items() if k != NAME}, v)
                for labels, v in series
            ]
            for t, series in cells.items()
        }
        return grid, out

    def topk(self, k, frame, modifier=None, bottom=False):
        grid, cells = frame
        out_cells = {}
        for t, samples in cells.items():
            groups = {}
            for idx, (labels, value) in enumerate(samples):
                gs = sig_of(self._group_labels(labels, modifier))
                groups.setdefault(gs, []).append((idx, labels, value))
            out = []
            for gs in sorted(groups):
                members = groups[gs]
                key = (lambda m: (m[2], m[0])) if bottom else (
                    lambda m: (-m[2], m[0]))
                for idx, labels, value in sorted(members, key=key)[:k]:
                    out.append((labels, value))
            if out:
                out_cells[t] = out
        return grid, out_cells

    def logical(self, op, lframe, rframe, matching=None):
        """Prometheus filter semantics — the rhs is a key set and never
        truncates the lhs. Grid: lhs grid for and/unless, union for or."""
        lgrid, lcells = lframe
        rgrid, rcells = rframe
        if op == "or":
            grid = sorted(set(lgrid) | set(rgrid))
        else:
            grid = list(lgrid)
        out_cells = {}
        for t in grid:
            lss = lcells.get(t, [])
            rss = rcells.get(t, [])
            rsigs = {sig_of(self._match_labels(l, matching)) for l, _ in rss}
            lsigs = {sig_of(self._match_labels(l, matching)) for l, _ in lss}
            if op == "and":
                out = [(l, v) for l, v in lss
                       if sig_of(self._match_labels(l, matching)) in rsigs]
            elif op == "unless":
                out = [(l, v) for l, v in lss
                       if sig_of(self._match_labels(l, matching)) not in rsigs]
            else:  # or
                out = list(lss) + [
                    (l, v) for l, v in rss
                    if sig_of(self._match_labels(l, matching)) not in lsigs
                ]
            if out:
                out_cells[t] = out
        return grid, out_cells

    def group_left(self, op, mframe, oframe, matching=None, include=()):
        """many-side (left) keeps its labels minus __name__; include labels
        copy from the one side; one side must be unique per match sig."""
        mgrid, mcells = mframe
        ogrid, ocells = oframe
        if not mgrid or not ogrid:
            return [], {}
        cutoff = min(max(mgrid), max(ogrid))
        grid = sorted(t for t in set(mgrid) | set(ogrid) if t <= cutoff)
        out_cells = {}
        for t in grid:
            ones = {}
            for labels, v in ocells.get(t, []):
                ms = sig_of(self._match_labels(labels, matching))
                if ms in ones:
                    raise ValueError("multiple matches on the 'one' side")
                ones[ms] = (labels, v)
            out = []
            for labels, mv in mcells.get(t, []):
                ms = sig_of(self._match_labels(labels, matching))
                if ms not in ones:
                    continue
                olabels, ov = ones[ms]
                nl = {k: v for k, v in labels.items() if k != NAME}
                for lbl in include:
                    if lbl in olabels:
                        nl[lbl] = olabels[lbl]
                    else:
                        nl.pop(lbl, None)
                out.append((nl, float(self._scalar_op(op, mv, ov))))
            if out:
                out_cells[t] = out
        return grid, out_cells

    def rate_family(self, fn, frame):
        """rate/increase/delta over a range-selector frame (cells hold
        per-series point lists). n>=2 required; rate also needs span>0."""
        grid, cells = frame
        out_cells = {}
        for t, series in cells.items():
            out = []
            for labels, pts in series:  # [(ts, seq, value)] asc by (ts, seq)
                if len(pts) < 2:
                    continue
                ft, _, fv = pts[0]
                lt, _, lv = pts[-1]
                if fn == "rate":
                    if lt <= ft:
                        continue
                    v = (lv - fv) / ((lt - ft) / 1000.0)
                else:  # increase / delta
                    v = lv - fv
                out.append((
                    {k: lv2 for k, lv2 in labels.items() if k != NAME}, float(v)
                ))
            if out:
                out_cells[t] = out
        return grid, out_cells
