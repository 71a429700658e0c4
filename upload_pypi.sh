#!/bin/sh
# Build + upload the package (reference upload_pypi.sh counterpart).
set -e
rm -rf dist build
python setup.py sdist bdist_wheel
python -m twine upload dist/*
