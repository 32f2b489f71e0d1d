"""Geometric thresholds of the extraction pipeline.

Values match the reference's published constants
(/root/reference/constants.py:10-69) — they are part of the *behavioral
contract* (span-sequence equality), not implementation detail.
"""

# Start searching for labels this many px below a section anchor so the
# header line itself is not consumed (reference constants.py:10).
ANCHOR_OFFSET_PX = 40

# Nominal render DPI and page pixel dimensions used by the synthetic
# perception layer (reference renders at 300 DPI, constants.py:13; US
# Letter at 300 DPI = 2550 x 3300).
RENDER_DPI = 300
PAGE_W = 2550
PAGE_H = 3300

# Template-match score floor and NMS top-left proximity radius
# (reference constants.py:16-17).
TEMPLATE_THRESHOLD = 0.6
DEDUPE_MAX_DIST = 5

# Multiline label matcher tolerances (reference constants.py:20-21).
LABEL_MULTILINE_BASE_X_TOLERANCE = 160
LABEL_MULTILINE_MAX_LOOKAHEAD = 5

# Checkbox row clustering gap and label→row-centroid assignment bound
# (reference constants.py:24-25).
LABEL_ROW_GAP_PX = 50
LABEL_CB_ASSIGN_MAX_DELTA_Y = 60

# Section region growth: grow down while successive checkbox y-gaps stay
# within this; then add the bottom buffer (reference constants.py:28-31).
SECTION_CB_MAX_GAP_PX = 100
SECTION_X1 = 0
SECTION_X2 = 2000
SECTION_BOTTOM_BUFFER_PX = 50

# Anchor must start within the first 10% of the page width
# (reference extractor.py:544).
ANCHOR_X_FRACTION = 0.10

# Cross-page continuation looks at the first K distinct-y line groups of
# the next page (reference extractor.py:195 next_page_head_lines=5).
NEXT_PAGE_HEAD_LINES = 5

# Template size of the checkbox match boxes (ticked.png / unticked.png
# are 37x37 in the reference).
TEMPLATE_W = 37
TEMPLATE_H = 37
