"""jsmini: a minimal ES2017-subset JavaScript interpreter for TESTS.

The self-hosted dashboard (ucfp_tpu/server/webui.py) embeds ~650 lines
of chart/driver JS, and this image ships no JS runtime — so the
dashboard previously had only static-consistency checks
(test_webui_js.py). jsmini executes the real page script against the
real in-process server handlers: DOM + canvas + fetch are host stubs
(tests/jsmini/dom.py), everything else is interpreted JS.

Scope: exactly the language subset the dashboard uses (arrow + async
functions, template literals, destructuring, spread, BigInt, regex
literals, try/catch, for-of). NOT a general-purpose engine — unknown
syntax raises, which is the desired behavior for a test harness: a new
JS feature in webui.py must be added here consciously.

This package is test infrastructure only; nothing in ucfp_tpu imports
it.
"""

from .interp import Interpreter, JSError  # noqa: F401
from .parser import parse  # noqa: F401
