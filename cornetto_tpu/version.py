__version__ = "0.1.0"

# Version string of the reference C toolkit whose CLI surface we reproduce
# (reference: src/main.c:136 prints "cornetto <version>").
REFERENCE_VERSION = "0.2.0"
