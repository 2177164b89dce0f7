# Dev workflow (reference: Makefile check/format/test/explore targets).

check:
	@python -m ruff check dexterity_tpu/ tests/ 2>/dev/null \
	  || python -m compileall -q dexterity_tpu/ tests/ examples/ scripts/

test:
	python -m pytest tests/ -q -n auto

test-fast:
	python -m pytest tests/ -q -n auto -m "not slow" --ignore=tests/test_suite.py

bench:
	python bench.py

explore:
	python -m dexterity_tpu.manipulation.explore

import-hands:
	python tools/import_hands.py

.PHONY: check test test-fast bench explore import-hands
