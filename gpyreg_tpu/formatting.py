"""Generic object-repr machinery (API parity with reference
formatting.py: summarize / format_dict / get_repr / full_repr)."""

from textwrap import indent

import numpy as np


def summarize(obj, arr_size_thresh=10, precision=4):
    """One-line summary of an object; small arrays print fully, large
    arrays print shape and type only."""
    if not isinstance(obj, np.ndarray):
        return get_repr(obj)
    if np.prod(obj.shape) < arr_size_thresh:
        array_string = np.array2string(
            obj, precision=precision, suppress_small=True, separator=", "
        )
        if "\n" in array_string:
            array_string = indent("\n" + array_string, "    ")
        return f"{array_string} : {type(obj).__name__}"
    return f"{obj.shape} {type(obj).__name__}"


def format_dict(d, **kwargs):
    """Pretty-print a dictionary, summarizing array values."""
    if d is None:
        return "None"
    body = ""
    for key, val in d.items():
        body += repr(key) if isinstance(key, str) else str(key)
        if type(val) == dict:
            body += f": {format_dict(val, **kwargs)},\n"
        else:
            body += f": {summarize(val, **kwargs)},\n"
    return "{\n" + indent(body, "    ") + "}"


def get_repr(obj, expand=False, full=False, **kwargs):
    """Short or recursively-expanded representation of an object."""
    if expand:
        if type(obj) == dict:
            return format_dict(obj, **kwargs)
        if type(obj) == np.ndarray:
            return summarize(obj, **kwargs)
        try:
            return obj.__repr__(expand=True, full=full)
        except TypeError:
            return repr(obj)
    if hasattr(obj, "_short_repr"):
        return obj._short_repr()
    if type(obj) == dict:
        return object.__repr__(obj)
    if type(obj) == np.ndarray:
        return summarize(obj, **kwargs)
    return repr(obj)


def full_repr(obj, title, order=None, exclude=None, **kwargs):
    """Multi-line representation: selected attributes first, then the
    remaining ``__dict__`` entries in sorted order."""
    body = []
    if order is None:
        order = []
    if exclude is None:
        exclude = []
    for key in order:
        if "." in key:
            sub_obj = obj
            for subkey in key.split("."):
                sub_obj = getattr(sub_obj, subkey, None)
        else:
            sub_obj = getattr(obj, key, None)
        body.append(f"self.{key} = {get_repr(sub_obj, **kwargs)}")

    try:
        items = sorted(obj.__dict__.items())
    except TypeError:
        items = obj.__dict__.items()
    for key, val in items:
        if key not in order and key not in exclude:
            body.append(f"self.{key} = {get_repr(val, **kwargs)}")

    return title + ":\n" + indent(",\n".join(body), "    ")
