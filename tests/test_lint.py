"""Undefined-name lint over the package (pyflakes is not installed here).

A scope bug in a Pallas kernel body (e.g. a name defined only in a sibling
kernel function) is a *trace-time* crash that only fires when that feature
branch is enabled — exactly the class of bug that hid the per-head
blocksparse backward NameError. This walks every function scope with
`symtable` and flags loads of names that are bound in no enclosing scope,
module global, or builtin.
"""

import builtins
import pathlib
import symtable

import pytest

PKG = pathlib.Path(__file__).resolve().parent.parent / "xhy_flash_attention_tpu"

# Names legitimately resolved at runtime (none expected; keep explicit).
ALLOWED = {"__file__", "__name__", "__doc__", "__package__", "__spec__",
           "__loader__", "__builtins__", "__path__", "__debug__"}


def _collect_defined(table):
    """Names bound in this table's scope."""
    out = set()
    for sym in table.get_symbols():
        if (
            sym.is_assigned()
            or sym.is_imported()
            or sym.is_parameter()
            or sym.is_namespace()
        ):
            out.add(sym.get_name())
    # comprehension/lambda/class/function child names are bound in parent
    for child in table.get_children():
        if child.get_type() in ("function", "class"):
            out.add(child.get_name())
    return out


def _walk(table, enclosing, module_globals, errors, path):
    defined = _collect_defined(table)
    scope = enclosing | defined
    for sym in table.get_symbols():
        name = sym.get_name()
        if not sym.is_referenced():
            continue
        if name in ALLOWED or hasattr(builtins, name):
            continue
        if sym.is_global():
            if name not in module_globals:
                errors.append(f"{path}:{table.get_name()}: "
                              f"undefined global '{name}'")
        elif sym.is_free():
            if name not in scope:
                errors.append(f"{path}:{table.get_name()}: "
                              f"unbound free variable '{name}'")
        elif sym.is_local():
            pass  # locals may be conditionally bound; out of scope for this lint
    for child in table.get_children():
        # class bodies do not contribute to nested function scopes
        nested = scope if table.get_type() != "class" else enclosing
        _walk(child, nested, module_globals, errors, path)


@pytest.mark.parametrize(
    "path",
    sorted(PKG.rglob("*.py")),
    ids=lambda p: str(p.relative_to(PKG.parent)),
)
def test_no_undefined_names(path):
    src = path.read_text()
    top = symtable.symtable(src, str(path), "exec")
    module_globals = _collect_defined(top)
    # star imports make globals unknowable; skip those modules
    if "import *" in src:
        pytest.skip("star import")
    errors = []
    for child in top.get_children():
        _walk(child, module_globals, module_globals, errors,
              path.relative_to(PKG.parent))
    assert not errors, "\n".join(errors)
