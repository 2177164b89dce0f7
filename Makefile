# Dev workflow (reference: Makefile check/format/test/explore targets).

test:
	python -m pytest tests/ -x -q

test-fast:
	python -m pytest tests/ -x -q -m "not slow" --ignore=tests/test_suite.py

bench:
	python bench.py

explore:
	python -m dexterity_tpu.manipulation.explore

import-hands:
	python tools/import_hands.py

.PHONY: test test-fast bench explore import-hands
