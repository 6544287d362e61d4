"""Oracle-checked metadata + plugin-routing queries (SURVEY §2.1, §2.5).

S2/S3/S5 are the reference's extension-routing string algebra
(ref plugins.py:39-97, bio_image.py:284-304) re-expressed relationally so the
semantics are hash-checked, not just unit-tested; D4/D6/D7 are the metadata
operators (channel-name aggregation, dtype<->OME mapping, OME id generation,
ref ome_utils.py:17-63, :66-137, bio_image.py:1038-1049).

All inputs are literal VALUES tables (the reference operates on in-process
registries, not fixture data); both engines see identical literals.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from bioio_spark.queries.base import register
from bioio_spark.types import NUMPY_DTYPE_TO_OME

# --------------------------------------------------------------------------
# S2: extension normalization — lowercase, ensure leading '.', dedup keeping
# first-seen order (ref plugins.py:39-59). Relational dedup-preserving-order =
# group on the normalized form, keep min ordinal.
# --------------------------------------------------------------------------
_RAW_EXTS = [".CZI", "tiff", ".ome.tiff", ".TIFF", "czi", ".sld", "SLD",
             ".OME.TIFF"]
_EXT_VALUES = ", ".join(f"({i}, '{e}')" for i, e in enumerate(_RAW_EXTS))


@register(
    "s2_ext_normalize",
    oracle=f"""
    WITH raw(ord, ext) AS (VALUES {_EXT_VALUES}),
    norm AS (
      SELECT ord,
             CASE WHEN lower(ext) LIKE '.%' THEN lower(ext)
                  ELSE '.' || lower(ext) END AS ext
      FROM raw
    )
    SELECT min(ord) AS first_ord, ext
    FROM norm GROUP BY ext ORDER BY first_ord
    """,
    doc="S2 extension normalization (lowercase, dot-prefix, ordered dedup)",
)
def s2_ext_normalize(spark, sf_dir):
    raw = spark.createDataFrame(list(enumerate(_RAW_EXTS)),
                                "ord int, ext string")
    norm = raw.select(
        "ord",
        F.when(F.lower("ext").startswith("."), F.lower("ext"))
        .otherwise(F.concat(F.lit("."), F.lower("ext"))).alias("ext"))
    return (norm.groupBy("ext").agg(F.min("ord").alias("first_ord"))
            .select("first_ord", "ext").orderBy("first_ord"))


# --------------------------------------------------------------------------
# S3: extension families — union-find where two extensions join when one is a
# suffix of the other (ref plugins.py:62-97). Relational form: the suffixes of
# any string form a chain, so each extension's *shortest element-suffix* is a
# component invariant; families = distinct roots. Self-join on endswith +
# min-by-length, no iteration needed.
# --------------------------------------------------------------------------
_FAM_EXTS = [".tif", ".ome.tif", ".czi", ".lif", ".a.b", ".c.b", ".b",
             ".tiff", ".ome.tiff"]
_FAM_VALUES = ", ".join(f"('{e}')" for e in _FAM_EXTS)


@register(
    "s3_ext_families",
    oracle=f"""
    WITH exts(ext) AS (VALUES {_FAM_VALUES}),
    roots AS (
      SELECT e.ext,
             (SELECT s.ext FROM exts s
              WHERE e.ext LIKE '%' || s.ext
              ORDER BY length(s.ext), s.ext LIMIT 1) AS root
      FROM exts e
    )
    SELECT root, count(*) AS n_members,
           string_agg(ext, '|' ORDER BY ext) AS members
    FROM roots GROUP BY root ORDER BY root
    """,
    doc="S3 suffix-family grouping via shortest-suffix roots",
)
def s3_ext_families(spark, sf_dir):
    # members is serialized to a '|'-joined string, not ARRAY: the driver's
    # canonicalizer cannot sort array cells (r3 red).
    exts = spark.createDataFrame([(e,) for e in _FAM_EXTS], "ext string")
    sfx = exts.select(F.col("ext").alias("sfx"))
    roots = (
        exts.join(F.broadcast(sfx), F.col("ext").endswith(F.col("sfx")))
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("ext").orderBy(F.length("sfx"), "sfx")))
        .filter(F.col("rn") == 1)
        .select("ext", F.col("sfx").alias("root")))
    return (roots.groupBy("root")
            .agg(F.count(F.lit(1)).alias("n_members"),
                 F.concat_ws("|", F.array_sort(F.collect_list("ext")))
                 .alias("members"))
            .orderBy("root"))


# --------------------------------------------------------------------------
# S5: suffix match with query-string stripping (ref bio_image.py:284-304):
# case-insensitive endswith on the path OR on the path with '?query' removed.
# --------------------------------------------------------------------------
_PATHS = ["/data/a.CZI", "s3://b/x.ome.tiff?versionId=abc", "/d/y.tiff",
          "/e/z.txt", "http://h/p.TIFF?a=1&b=2", "/f/noext"]
_MATCH_EXTS = [".czi", ".ome.tiff", ".tiff"]
_PATH_VALUES = ", ".join(f"('{p}')" for p in _PATHS)
_MEXT_VALUES = ", ".join(f"('{e}')" for e in _MATCH_EXTS)


@register(
    "s5_path_ext_match",
    oracle=f"""
    WITH paths(path) AS (VALUES {_PATH_VALUES}),
    exts(ext) AS (VALUES {_MEXT_VALUES})
    SELECT p.path, e.ext
    FROM paths p CROSS JOIN exts e
    WHERE lower(p.path) LIKE '%' || e.ext
       OR lower(split_part(p.path, '?', 1)) LIKE '%' || e.ext
    ORDER BY p.path, e.ext
    """,
    doc="S5 case-insensitive extension match incl. query-string stripping",
)
def s5_path_ext_match(spark, sf_dir):
    paths = spark.createDataFrame([(p,) for p in _PATHS], "path string")
    exts = spark.createDataFrame([(e,) for e in _MATCH_EXTS], "ext string")
    stripped = F.split_part(F.col("path"), F.lit("?"), F.lit(1))
    return (paths.crossJoin(F.broadcast(exts))
            .filter(F.lower("path").endswith(F.col("ext"))
                    | F.lower(stripped).endswith(F.col("ext")))
            .orderBy("path", "ext"))


# --------------------------------------------------------------------------
# D6: numpy dtype -> OME PixelType mapping applied as a column expression
# (ref ome_utils.py:66-137; 10-entry map, mirrored in types.py).
# --------------------------------------------------------------------------
_D6_CASE = "CASE dtype " + " ".join(
    f"WHEN '{np}' THEN '{ome}'" for np, ome in sorted(
        NUMPY_DTYPE_TO_OME.items())) + " END"
_D6_VALUES = ", ".join(f"({i}, '{np}')" for i, np in enumerate(
    sorted(NUMPY_DTYPE_TO_OME)))


@register(
    "d6_dtype_ome_map",
    oracle=f"""
    WITH d(ord, dtype) AS (VALUES {_D6_VALUES})
    SELECT ord, dtype, {_D6_CASE} AS ome_type
    FROM d ORDER BY ord
    """,
    doc="D6 dtype->OME PixelType mapping as a relational expression",
)
def d6_dtype_ome_map(spark, sf_dir):
    d = spark.createDataFrame(
        list(enumerate(sorted(NUMPY_DTYPE_TO_OME))), "ord int, dtype string")
    mapping = F.create_map(
        *[F.lit(x) for kv in sorted(NUMPY_DTYPE_TO_OME.items()) for x in kv])
    return (d.select("ord", "dtype", mapping[F.col("dtype")]
                     .alias("ome_type"))
            .orderBy("ord"))


# --------------------------------------------------------------------------
# D7: OME id generation — Image:{i} and Channel:{image_idx}:{c} with the
# 'Image:' prefix stripped before embedding (ref ome_utils.py:17-63). Pure
# string functions: concat / replace / cast.
# --------------------------------------------------------------------------
_D7_IMAGES, _D7_CHANNELS = 4, 5


@register(
    "d7_ome_ids",
    oracle=f"""
    SELECT CAST(i AS INTEGER) AS scene_idx, CAST(c AS INTEGER) AS c,
           'Image:' || i AS image_id,
           'Channel:' || replace('Image:' || i, 'Image:', '') || ':' || c
             AS channel_id
    FROM range({_D7_IMAGES}) r(i) CROSS JOIN range({_D7_CHANNELS}) s(c)
    ORDER BY scene_idx, c
    """,
    doc="D7 OME image/channel id generation via string functions",
)
def d7_ome_ids(spark, sf_dir):
    base = (spark.range(_D7_IMAGES).select(F.col("id").alias("i"))
            .crossJoin(spark.range(_D7_CHANNELS)
                       .select(F.col("id").alias("c"))))
    image_id = F.concat(F.lit("Image:"), F.col("i"))
    channel_id = F.concat(
        F.lit("Channel:"), F.replace(image_id, F.lit("Image:"), F.lit("")),
        F.lit(":"), F.col("c"))
    return (base.select(F.col("i").cast("int").alias("scene_idx"),
                        F.col("c").cast("int").alias("c"),
                        image_id.alias("image_id"),
                        channel_id.alias("channel_id"))
            .orderBy("scene_idx", "c"))


# --------------------------------------------------------------------------
# D4: channel_names — ordered per-scene aggregation of the channels dimension
# table (ref bio_image.py:1038-1049; names generated per ome_utils rules).
# --------------------------------------------------------------------------
_D4_SCENES, _D4_C = 3, 4


@register(
    "d4_channel_names",
    oracle=f"""
    WITH ch AS (
      SELECT CAST(s AS INTEGER) AS scene_idx, CAST(c AS INTEGER) AS c,
             'Channel:' || s || ':' || c AS channel_name
      FROM range({_D4_SCENES}) r(s) CROSS JOIN range({_D4_C}) q(c)
    )
    SELECT scene_idx,
           string_agg(channel_name, '|' ORDER BY c) AS channel_names
    FROM ch GROUP BY scene_idx ORDER BY scene_idx
    """,
    doc="D4 per-scene ordered channel-name list aggregation",
)
def d4_channel_names(spark, sf_dir):
    ch = (spark.range(_D4_SCENES).select(F.col("id").alias("s"))
          .crossJoin(spark.range(_D4_C).select(F.col("id").alias("c")))
          .select(F.col("s").cast("int").alias("scene_idx"),
                  F.col("c").cast("int").alias("c"),
                  F.concat(F.lit("Channel:"), F.col("s"), F.lit(":"),
                           F.col("c")).alias("channel_name")))
    # '|'-joined scalar, not ARRAY (driver canonicalizer constraint, r3 red).
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("c", "channel_name"))),
        lambda x: x["channel_name"])
    return (ch.groupBy("scene_idx")
            .agg(F.concat_ws("|", ordered).alias("channel_names"))
            .orderBy("scene_idx"))


# --------------------------------------------------------------------------
# D2: ome_metadata — raw per-scene XML parsed into a nested struct with
# from_xml (attributes, nested Channel array), then flattened to the
# StandardMetadata scalars (ref bio_image.py:1021-1036; metadata tiers
# SURVEY §1.1). The oracle extracts the same fields from the same literal
# XML with regexes — a parser-independent cross-check.
# --------------------------------------------------------------------------
def _ome_xml(i: int) -> str:
    chans = "".join(
        f'<Channel ID="Channel:{i}:{c}" Name="Ch{i}-{c}"/>'
        for c in range(2 + i % 2))
    return (f'<Image ID="Image:{i}" Name="scene{i}">'
            f'<Pixels SizeX="{32 * (i + 1)}" SizeY="{16 * (i + 1)}" '
            f'SizeC="{2 + i % 2}" PhysicalSizeX="0.{25 + i}">'
            f'{chans}</Pixels></Image>')


_D2_N = 3
_D2_XML_VALUES = ", ".join(
    f"({i}, '{_ome_xml(i)}')" for i in range(_D2_N))

_OME_SCHEMA = (
    "STRUCT<_ID: STRING, _Name: STRING, Pixels: STRUCT<"
    "_SizeX: INT, _SizeY: INT, _SizeC: INT, _PhysicalSizeX: DOUBLE, "
    "Channel: ARRAY<STRUCT<_ID: STRING, _Name: STRING>>>>")


@register(
    "d2_ome_metadata",
    oracle=f"""
    WITH raw(scene_idx, xml) AS (VALUES {_D2_XML_VALUES})
    SELECT scene_idx,
           regexp_extract(xml, 'Name="([^"]+)"', 1) AS image_name,
           CAST(regexp_extract(xml, 'SizeX="(\\d+)"', 1) AS INTEGER)
             AS size_x,
           CAST(regexp_extract(xml, 'SizeY="(\\d+)"', 1) AS INTEGER)
             AS size_y,
           CAST(regexp_extract(xml, 'SizeC="(\\d+)"', 1) AS INTEGER)
             AS size_c,
           CAST(regexp_extract(xml, 'PhysicalSizeX="([0-9.]+)"', 1)
                AS DOUBLE) AS physical_size_x,
           array_to_string(
             regexp_extract_all(xml, '<Channel[^>]*Name="([^"]+)"', 1), '|')
             AS channel_names
    FROM raw ORDER BY scene_idx
    """,
    doc="D2 OME-XML metadata parse to nested struct + flat scalars",
)
def d2_ome_metadata(spark, sf_dir):
    raw = spark.createDataFrame(
        [(i, _ome_xml(i)) for i in range(_D2_N)],
        "scene_idx int, xml string")
    ome = F.from_xml("xml", _OME_SCHEMA)
    return (raw.select("scene_idx", ome.alias("ome"))
            .select(
                "scene_idx",
                F.col("ome._Name").alias("image_name"),
                F.col("ome.Pixels._SizeX").alias("size_x"),
                F.col("ome.Pixels._SizeY").alias("size_y"),
                F.col("ome.Pixels._SizeC").alias("size_c"),
                F.col("ome.Pixels._PhysicalSizeX").alias("physical_size_x"),
                F.concat_ws(
                    "|",
                    F.transform(F.col("ome.Pixels.Channel"),
                                lambda c: c["_Name"])).alias("channel_names"))
            .orderBy("scene_idx"))
