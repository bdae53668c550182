"""Track selection + language fan-out (SURVEY.md §2.1 S4).

Replicates MkvUtilities (/root/reference/src/PgsToSrt/MkvUtilities.cs):

  * ``pgs_tracks``      — GetPgsSubtitleTracks (:98-115): keep tracks with
                          CodecId == "S_HDMV/PGS", ordered by track number.
  * ``tracks_by_language`` — GetTracksByLanguage (:76-96): one output row
                          per PGS track whose language matches
                          (case-insensitive), with the reference's output
                          filename contract (:20-55):
                          ``{base}.{language}{number}{.forced}.srt`` where
                          colliding names within one source file take the
                          number sequence "", 2, 3, ... in track order
                          (the retry loop at :24-46 starts at 2: the first
                          collision sets number=1 then immediately +=1).

The input is a track-metadata table (container demux is upstream
ingestion, SURVEY.md §2.1 S2): (source, track_number, codec_id, language,
is_forced).  The collision numbering is a window rank over the
lower-cased candidate name *without* its number — exact unless a language
string itself ends in digits that alias another track's numbered name
(e.g. language 'en2' vs 'en' rank 2), a cross-key collision the
reference's sequential retry loop would bump further; declared out of
scope for the parallel formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["TRACKS_SCHEMA", "pgs_tracks", "tracks_by_language"]

TRACKS_SCHEMA = (
    "source string, track_number long, codec_id string, "
    "language string, is_forced boolean"
)

_PGS_CODEC = "s_hdmv/pgs"


def pgs_tracks(tracks: DataFrame) -> DataFrame:
    """PGS subtitle tracks in track order (MkvUtilities.cs:98-115).

    The reference compares CodecId with string.Equals (case-sensitive for
    the codec id itself; Matroska codec ids are canonical upper) — we
    match case-insensitively, which is a superset on malformed files.
    """
    return tracks.filter(F.lower(F.col("codec_id")) == _PGS_CODEC).orderBy(
        "track_number"
    )


def tracks_by_language(tracks: DataFrame, language: str) -> DataFrame:
    """-> (source, track_number, output_name): the per-track fan-out plan
    rows (TrackOutputOption analog, MkvUtilities.cs:76-96)."""
    t = pgs_tracks(tracks).filter(F.lower(F.col("language")) == language.lower())
    forced_part = F.when(F.col("is_forced"), F.lit(".forced")).otherwise(F.lit(""))
    # collision key: the candidate name without its number, lower-cased
    # (the reference compares output names OrdinalIgnoreCase, :29-31)
    key = F.lower(F.concat(F.col("source"), F.lit("."), F.col("language"), forced_part))
    rnk = F.row_number().over(Window.partitionBy(key).orderBy("track_number"))
    name = F.concat(
        F.col("source"),
        F.lit("."),
        F.col("language"),
        F.when(rnk == 1, F.lit("")).otherwise(rnk.cast("string")),
        forced_part,
        F.lit(".srt"),
    )
    return t.select("source", "track_number", name.alias("output_name"))
