"""Dataset-entry selection + logging helpers for the DensePose CLI tools
(reference projects/DensePose/densepose/utils/{dbhelper,logger}.py).

``EntrySelector.from_string`` parses the query_db selector grammar::

    <specifiers> ::= <specifier>[,<specifiers>]
    <specifier>  ::= <field_name>[:<type>]=<value_or_range>
    <type>       ::= "int" | "str" | ... (any builtin)
    <range>      ::= <value>-<value>

e.g. ``image_id:int=18-25,height:int=480`` selects entries with image_id in
[18, 25] and height exactly 480; ``*`` selects everything.
"""

import builtins
import logging
from typing import Any, Dict, Optional, Tuple

__all__ = ["EntrySelector", "AllEntrySelector", "FieldEntrySelector", "verbosity_to_level"]


def verbosity_to_level(verbosity) -> int:
    """-v count -> logging level (reference utils/logger.py:7-15)."""
    if verbosity is not None:
        if verbosity >= 2:
            return logging.DEBUG
        if verbosity == 1:
            return logging.INFO
    return logging.WARNING


class EntrySelector:
    """Base class for entry selectors (reference dbhelper.py:6-16)."""

    @staticmethod
    def from_string(spec: str) -> "EntrySelector":
        if spec == "*":
            return AllEntrySelector()
        return FieldEntrySelector(spec)


class AllEntrySelector(EntrySelector):
    SPECIFIER = "*"

    def __call__(self, entry):
        return True


class _ValuePredicate:
    def __init__(self, name: str, typespec: Optional[str], value: str):
        self.name = name
        self.type = getattr(builtins, typespec) if typespec is not None else str
        self.value = value

    def __call__(self, entry):
        return entry[self.name] == self.type(self.value)


class _RangePredicate:
    def __init__(self, name: str, typespec: Optional[str], vmin: str, vmax: str):
        self.name = name
        self.type = getattr(builtins, typespec) if typespec is not None else str
        self.vmin = vmin
        self.vmax = vmax

    def __call__(self, entry):
        return self.type(self.vmin) <= entry[self.name] <= self.type(self.vmax)


class FieldEntrySelector(EntrySelector):
    """Field-constraint selector (reference dbhelper.py:29-152)."""

    _SPEC_DELIM = ","
    _TYPE_DELIM = ":"
    _RANGE_DELIM = "-"
    _EQUAL = "="
    _ERROR_PREFIX = "Invalid field selector specifier"

    def __init__(self, spec: str):
        self._predicates = self._parse(spec)

    def __call__(self, entry: Dict[str, Any]):
        return all(p(entry) for p in self._predicates)

    def _parse(self, spec: str):
        predicates = []
        for subspec in spec.split(self._SPEC_DELIM):
            eq_idx = subspec.find(self._EQUAL)
            if eq_idx > 0:
                field_name, field_type = self._parse_name_type(subspec[:eq_idx])
                value_or_range = subspec[eq_idx + 1 :]
                delim_idx = value_or_range.find(self._RANGE_DELIM)
                if delim_idx > 0:
                    predicates.append(
                        _RangePredicate(
                            field_name,
                            field_type,
                            value_or_range[:delim_idx],
                            value_or_range[delim_idx + 1 :],
                        )
                    )
                else:
                    predicates.append(_ValuePredicate(field_name, field_type, value_or_range))
            elif eq_idx == 0:
                self._error(f'"{subspec}", field name is empty!')
            else:
                self._error(f'"{subspec}", should have format <field>=<value_or_range>!')
        return predicates

    def _parse_name_type(self, name_with_type: str) -> Tuple[str, Optional[str]]:
        idx = name_with_type.find(self._TYPE_DELIM)
        if idx > 0:
            return name_with_type[:idx], name_with_type[idx + 1 :]
        if idx == 0:
            self._error(f'"{name_with_type}", field name is empty!')
        return name_with_type, None

    def _error(self, msg):
        raise ValueError(f"{self._ERROR_PREFIX}: {msg}")
