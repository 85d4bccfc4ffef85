"""Search-box assistant: expression calculator + unit conversion.

Reference behavior re-expressed from scratch:

- ``code/functions/math/java/nu/marginalia/functions/math/eval/
  MathParser.java`` — the search box's inline calculator: tokenize
  (numbers, names, ``()+-/*^``), then staged rewriting (parenthesize →
  unary-minus fold → function application → ``^`` → ``*/`` → ``+-``),
  constants ``e``/``pi``/``2pi``, functions sqrt/log/log10/log2/cos/sin/
  tan, NaN on division by zero, US-locale HALF_UP formatting with max 6
  fraction digits.
- ``eval/Units.java`` + ``resources/units.csv`` — unit conversion via a
  per-type base value (``from.base * value / to.base``), special-cased
  temperature formulas, result formatted to the input's significant-figure
  count with DecimalFormat digit caps.

These are query-time assistant functions (the reference serves them from
the driver, per request — there is no corpus pass), so the natural Spark
shape is: pure Python here, applied to a column via ``mapInPandas`` only
when someone genuinely wants to evaluate an expression *column* (the
driver-contract entries do exactly that to gate this module).
"""

from __future__ import annotations

import math
import re
from decimal import ROUND_HALF_UP, Decimal

__all__ = ["MathParser", "Units", "UNITS_CSV"]


class ParseError(ValueError):
    pass


_CONSTANTS = {"e": math.e, "pi": math.pi, "2pi": 2 * math.pi}
_FUNCTIONS = {
    "sqrt": math.sqrt,
    "log": math.log,
    "log10": math.log10,
    "log2": lambda x: math.log(x) / math.log(2.0),
    "cos": math.cos,
    "sin": math.sin,
    "tan": math.tan,
}
_TRIVIAL_RE = re.compile(r"([0-9]+\.[0-9]*|\.[0-9]+)$")


def _format_us(value: float, max_frac: int = 6) -> str:
    """US-locale DecimalFormat analogue: HALF_UP, ``max_frac`` fraction
    digits max, no trailing zeros, thousands grouping."""
    if value != value or value in (float("inf"), float("-inf")):
        return {float("inf"): "∞", float("-inf"): "-∞"}.get(value, "NaN")
    q = Decimal(repr(value)).quantize(
        Decimal(1).scaleb(-max_frac), rounding=ROUND_HALF_UP
    )
    s = format(q.normalize() if q == q.to_integral() else q.normalize(), "f")
    int_part, _, frac = s.partition(".")
    neg = int_part.startswith("-")
    if neg:
        int_part = int_part[1:]
    grouped = f"{int(int_part):,}" if int_part else "0"
    out = ("-" if neg else "") + grouped + (("." + frac) if frac else "")
    return out


class _Tok:
    __slots__ = ("t", "v", "args")

    def __init__(self, t: str, v=None, args=None):
        self.t, self.v, self.args = t, v, args


class MathParser:
    """Recursive-rewrite expression evaluator (MathParser.java mirror)."""

    def eval(self, expr: str) -> float:
        if _TRIVIAL_RE.match(expr):
            return float(expr)
        toks = self._tokenize(expr)
        toks = self._parenthesize(toks)
        toks = self._negate(toks)
        toks = self._functions(toks)
        for ops in ("^", "*/", "+-"):
            toks = self._binary(toks, ops)
        if len(toks) != 1:
            raise ParseError(expr)
        return self._value(toks[0])

    def eval_formatted(self, expr: str) -> str:
        """evalFormatted: empty string on any parse failure."""
        try:
            if _TRIVIAL_RE.match(expr):
                return _format_us(float(expr))
            return _format_us(self.eval(expr))
        except (ParseError, ValueError, OverflowError):
            return ""

    # -- tokenizer (MathParser.tokenize) --------------------------------

    def _tokenize(self, expr: str) -> list[_Tok]:
        toks: list[_Tok] = []
        i, n = 0, len(expr)
        while i < n:
            c = expr[i]
            if c in "()+-/*^":
                toks.append(_Tok(c))
                i += 1
            elif c.isdigit():
                j, has_period = i + 1, False
                while j < n:
                    c2 = expr[j]
                    if c2.isdigit():
                        j += 1
                    elif c2 == "." and not has_period:
                        has_period, j = True, j + 1
                    elif c2 == ".":
                        raise ParseError(f"malformatted number in {expr!r}")
                    else:
                        break
                toks.append(_Tok("0", expr[i:j]))
                i = j
            elif c.isalpha():
                j = i + 1
                while j < n and expr[j].isalpha():
                    j += 1
                name = expr[i:j]
                toks.append(_Tok("C" if name in _CONSTANTS else "A", name))
                i = j
            elif c.isspace():
                i += 1
            else:
                raise ParseError(f"unexpected {c!r} in {expr!r}")
        return toks

    # -- staged rewrites -------------------------------------------------

    def _recurse(self, toks: list[_Tok], fn) -> None:
        for t in toks:
            if t.args is not None:
                if t.t == " ":
                    t.args = fn(t.args)
                else:
                    self._recurse(t.args, fn)

    def _parenthesize(self, toks: list[_Tok]) -> list[_Tok]:
        i = 0
        while i < len(toks):
            t = toks[i]
            if t.t == ")":
                raise ParseError("unbalanced parentheses")
            if t.t == "(":
                depth, j = 0, i + 1
                while j < len(toks):
                    t2 = toks[j]
                    if t2.t == "(":
                        depth += 1
                    elif t2.t == ")":
                        if depth == 0:
                            break
                        depth -= 1
                    j += 1
                if j == len(toks):
                    raise ParseError("unbalanced parentheses")
                toks[i] = _Tok(" ", args=self._parenthesize(toks[i + 1 : j]))
                del toks[i + 1 : j + 1]
            i += 1
        return toks

    def _negate(self, toks: list[_Tok]) -> list[_Tok]:
        self._recurse(toks, self._negate)
        i = 0
        while i < len(toks) - 1:
            if toks[i].t != "-":
                i += 1
                continue
            if i == 0 or toks[i - 1].t in "+-%*/A":
                toks[i] = _Tok("~", args=[toks[i + 1]])
                del toks[i + 1]
            else:
                i += 1
        return toks

    def _functions(self, toks: list[_Tok]) -> list[_Tok]:
        self._recurse(toks, self._functions)
        i = 0
        while i < len(toks) - 1:
            if toks[i].t == "A":
                toks[i] = _Tok("F", v=toks[i].v, args=[toks[i + 1]])
                del toks[i + 1]
            else:
                i += 1
        return toks

    def _binary(self, toks: list[_Tok], ops: str) -> list[_Tok]:
        self._recurse(toks, lambda ts: self._binary(ts, ops))
        i = 1
        while i < len(toks) - 1:
            if toks[i].t in ops:
                toks[i] = _Tok("B", v=toks[i].t, args=[toks[i - 1], toks[i + 1]])
                del toks[i + 1]
                del toks[i - 1]
                i -= 1
                continue
            i += 1
        return toks

    # -- evaluation ------------------------------------------------------

    def _value(self, t: _Tok) -> float:
        if t.t == "0":
            return float(t.v)
        if t.t == "C":
            return _CONSTANTS[t.v]
        if t.t == "~":
            return -self._value(t.args[0])
        if t.t == " ":
            if len(t.args) == 1:
                return self._value(t.args[0])
            raise ParseError("cannot evaluate group")
        if t.t == "F":
            fn = _FUNCTIONS.get(t.v.lower())
            if fn is None:
                raise ParseError(f"unknown function {t.v!r}")
            # function binds the immediately following token/group
            # (sqrt 4 and sqrt(4) both work, as in the reference)
            return fn(self._value(t.args[0]))
        if t.t == "B":
            op = t.v
            right = self._value(t.args[1])
            if op == "+":
                return self._value(t.args[0]) + right
            if op == "-":
                return self._value(t.args[0]) - right
            if op == "*":
                return self._value(t.args[0]) * right
            if op == "/":
                return float("nan") if right == 0 else self._value(t.args[0]) / right
            if op == "%":
                return float("nan") if right == 0 else math.fmod(self._value(t.args[0]), right)
            if op == "^":
                return self._value(t.args[0]) ** right
        raise ParseError(f"cannot evaluate {t.t!r}")


# the reference's units.csv verbatim (resources/units.csv): base value,
# type, canonical name, aliases...  (data file, including its quirks —
# e.g. day=864000 — reproduced as-is for conversion parity)
UNITS_CSV = """\
30856775800000000,DISTANCE,pc,parsec,parsecs
9460500000000000,DISTANCE,ly,light years,light year
149597870700,DISTANCE,au,astronomical unit
1000,DISTANCE,km,kilometers,kilometer
1,DISTANCE,m,meters,meter
0.1,DISTANCE,dm,decimeters,decimeter
0.01,DISTANCE,cm,centimeters,centimeter
0.001,DISTANCE,mm,millimeters,millimeter
0.9144,DISTANCE,yd,yards,yard
0.0254,DISTANCE,in,inches,inch
0.3048,DISTANCE,ft,feet,foot
1609.344,DISTANCE,miles,mile
1852,DISTANCE,nautical miles,nautical mile
201.168,DISTANCE,furlong,furlongs
1,WEIGHT,kg,kilograms,kilogram
0.001,WEIGHT,g,grams,gram
1000,WEIGHT,metric tons,ton,tons,tonne,tonnes
907.185,WEIGHT,short tons,short ton,imperial ton,imperial tons
0.45359237,WEIGHT,lb,lbs,pounds
0.0283495231,WEIGHT,oz,ounces,ounce
1,AREA,m^2,square meters,square meter
0.01,AREA,dm^2,square decimeters,square decimeter
0.0001,AREA,cm^2,square centimeters,square centimeter
0.000001,AREA,mm^2,square millimeters,square millimeter
1000000,AREA,km^2,square kilometers,square kilometer
4046.9,AREA,ac,acre,acres
2589988.1103360,AREA,sq mi,mi^2,square miles,square mile
258.99881103360,AREA,hectares,hectare
0.09290304,AREA,ft^2,square foot,square feet
0.83612736,AREA,yd^2,square yard,square yards
0.00064516,AREA,in^2,square inch,square inches
1,VOLUME,m^3,cubic meter,cubic meters
1000000000,VOLUME,km^3,cubic kilometer,cubic kilometers
0.001,VOLUME,L,l,dm^3,liter,liters,cubic decimeter
0.0001,VOLUME,dl,deciliter,deciliters
0.0001,VOLUME,cl,centiliter,centiliters
0.00001,VOLUME,ml,milliliter,milliliters
0.000001,VOLUME,cm^3,cc,cubic centimeter,cubic centimeters
0.000000001,VOLUME,mm^3,cubic millimeter,cubic millimeters
0.000236588237,VOLUME,us cup,cup,cups
0.0000295735296,VOLUME,fl.oz.,fl oz,fluid ounces,fluid ounce
0.028316846592,VOLUME,ft^3,cubic foot,cubic feet
0.000016387064,VOLUME,in^3,cubic inch,cubic inches
0.764554857984,VOLUME,yd^3,cubic yard,cubic yards
0.000473176473,VOLUME,US pint,pint,pints
0.00378541178,VOLUME,gallon,gallons
1,TEMPERATURE,C,c,celsius,centigrade
0,TEMPERATURE,F,f,fahrenheit
0,TEMPERATURE,K,k,kelvin,kelvins
1,TIME,S,s,second,seconds
0.001,TIME,ms,millisecond
60,TIME,min,minutes
3600,TIME,hour,hours
864000,TIME,day,days
604800,TIME,week,weeks
31557600.0,TIME,year,years
315576000.0,TIME,decade,decades
3155760000.0,TIME,century,centuries
1,ANGLE,degree,degrees
57.2957795,ANGLE,radians,radian
"""


class _Unit:
    __slots__ = ("name", "type", "base")

    def __init__(self, name: str, type_: str, base: float):
        self.name, self.type, self.base = name, type_, base


class Units:
    """Unit conversion (Units.java mirror). ``convert`` returns
    ``(value, unit_name, formatted)`` or None when units are unknown or
    type-incompatible."""

    def __init__(self, parser: MathParser | None = None):
        self.parser = parser or MathParser()
        self.by_name: dict[str, _Unit] = {}
        for line in UNITS_CSV.splitlines():
            vals = line.split(",")
            unit = _Unit(vals[2], vals[1], float(vals[0]))
            for alias in vals[2:]:
                if alias:
                    self.by_name[alias.lower()] = unit

    def convert(
        self, value: str, from_name: str, to_name: str
    ) -> tuple[float, str, str] | None:
        fu = self.by_name.get(from_name.lower())
        tu = self.by_name.get(to_name.lower())
        if fu is None or tu is None:
            return None
        if fu is tu:
            try:
                v = self.parser.eval(value)
            except (ParseError, ValueError):
                return None
            return v, fu.name, f"{value} {fu.name}"
        if fu.type != tu.type:
            return None
        try:
            v = self.parser.eval(value)
        except (ParseError, ValueError):
            return None
        if fu.type == "TEMPERATURE":
            converted = self._convert_temperature(v, fu.name, tu.name)
        else:
            converted = fu.base * v / tu.base
        return converted, tu.name, self._format(converted, value, tu.name)

    @staticmethod
    def _convert_temperature(v: float, f: str, t: str) -> float:
        if f == "C":
            if t == "K":
                return v + 273.15
            if t == "F":
                return 32.0 + 9 * v / 5
        elif f == "F":
            if t == "C":
                return 5 * (v - 32.0) / 9
            if t == "K":
                return 5 * (v - 32.0) / 9 + 273.15
        elif f == "K":
            if t == "C":
                return v - 273.15
            if t == "F":
                return 32.0 + 9 * (v - 273.15) / 5
        return 0.0

    @staticmethod
    def _format(converted: float, input_value: str, unit_name: str) -> str:
        """Sig-fig-capped DecimalFormat analogue (Units.convert tail):
        fraction digits = 1 + sigfigs − integer-magnitude."""
        negative = converted < 0
        mag = abs(converted)
        int_fraction = int(math.log10(mag)) if mag > 0 else 0
        sig_figs = sum(ch.isdigit() for ch in input_value)
        max_frac = max(0, 1 + sig_figs - int_fraction)
        q = Decimal(repr(mag)).quantize(
            Decimal(1).scaleb(-max_frac), rounding=ROUND_HALF_UP
        )
        s = format(q.normalize() if q == q.to_integral() else q.normalize(), "f")
        ip, _, fp = s.partition(".")
        out = f"{int(ip):,}" + (("." + fp) if fp else "")
        return ("-" if negative else "") + out + " " + unit_name
