"""Auxiliary tag names stamped by the merge/transform pipeline.

Parity with reference AuxiliaryTags
(reader/.../readers/utils/AuxiliaryTags.scala:20-43). Plus Column helpers for
reading tags out of the typed-union tags array.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

INFRASTRUCTURE_LOCATION = "X-HAYSTACK-AWS-REGION"
INFRASTRUCTURE_PROVIDER = "X-HAYSTACK-INFRASTRUCTURE-PROVIDER"

IS_MERGED_SPAN = "X-HAYSTACK-IS-MERGED-SPAN"
NETWORK_DELTA = "X-HAYSTACK-NETWORK-DELTA"

CLIENT_SERVICE_NAME = "X-HAYSTACK-CLIENT-SERVICE-NAME"
CLIENT_OP_NAME = "X-HAYSTACK-CLIENT-OPERATION-NAME"
CLIENT_SPAN_ID = "X-HAYSTACK-CLIENT-SPAN-ID"
CLIENT_START_TIME = "X-HAYSTACK-CLIENT-START-TIME"
CLIENT_DURATION = "X-HAYSTACK-CLIENT-DURATION"

SERVER_SERVICE_NAME = "X-HAYSTACK-SERVER-SERVICE-NAME"
SERVER_OP_NAME = "X-HAYSTACK-SERVER-OPERATION-NAME"
SERVER_START_TIME = "X-HAYSTACK-SERVER-START-TIME"
SERVER_DURATION = "X-HAYSTACK-SERVER-DURATION"

ERR_IS_MULTI_PARTIAL_SPAN = "X-HAYSTACK-ERR-IS-MULTI-PARTIAL-SPAN"

# InvalidRootTransformer autogen markers (InvalidRootTransformer.scala:40-79)
AUTOGEN_REASON = "X-HAYSTACK-AUTOGEN-REASON"
AUTOGEN_ROOT_COUNT = "X-HAYSTACK-AUTOGEN-ORIGINAL-ROOT-COUNT"

SPAN_KIND_TAG = "span.kind"


def tag_str(tags: Column | str, key: str) -> Column:
    """String value of the first tag with the given key (any vtype)."""
    tags_c = F.col(tags) if isinstance(tags, str) else tags
    # try_element_at: ANSI-safe on empty arrays (no-tag spans)
    hit = F.try_element_at(F.filter(tags_c, lambda t: t["key"] == key), F.lit(1))
    return (
        F.when(hit["vtype"] == "STRING", hit["vstr"])
        .when(hit["vtype"] == "LONG", hit["vlong"].cast("string"))
        .when(hit["vtype"] == "DOUBLE", hit["vdouble"].cast("string"))
        .when(hit["vtype"] == "BOOL", hit["vbool"].cast("string"))
        .when(hit["vtype"] == "BINARY", hit["vbytes"].cast("string"))
    )
