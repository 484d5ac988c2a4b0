package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Shared text-preparation primitives for the LLM-pipeline operators, with
  * their DuckDB-SQL mirrors. Everything is deterministic and engine-portable:
  * regex classes limited to ASCII, hashing is explicit integer arithmetic
  * (31-base polynomial mod 1e9+7) rather than an engine-native hash whose
  * algorithm differs between Spark (murmur3) and DuckDB.
  */
object TextPrep {

  /** Lowercase, strip non-alphanumerics to spaces, collapse whitespace. */
  def clean(c: Column): Column =
    trim(regexp_replace(regexp_replace(lower(c), "[^a-z0-9\\s]", " "), "\\s+", " "))
  /** DuckDB mirror of [[clean]] over an arbitrary column expression. */
  def cleanSqlOf(c: String): String =
    s"trim(regexp_replace(regexp_replace(lower($c), '[^a-z0-9\\s]', ' ', 'g'), '\\s+', ' ', 'g'))"
  val cleanSql: String = cleanSqlOf("text")

  /** Whitespace tokens of a cleaned string. */
  def tokens(c: Column): Column = split(c, " ")

  /** Distinct 3-word shingles; falls back to the whole string when there are
    * fewer than 3 tokens so short docs still participate. */
  def shingles3(toks: Column, whole: Column): Column =
    when(size(toks) >= 3,
      array_distinct(transform(sequence(lit(0), size(toks) - 3),
        i => array_join(slice(toks, i + lit(1), lit(3)), " "))))
      .otherwise(array(whole))
  /** DuckDB mirror over a token-list column `t` and whole-string column `c`. */
  def shingles3Sql(t: String, c: String): String =
    s"CASE WHEN len($t) >= 3 THEN list_distinct(list_transform(range(0, len($t)-2), i -> array_to_string($t[i+1:i+3], ' '))) ELSE [$c] END"

  /** 31-base polynomial string hash mod 1e9+7 — identical left-fold in both
    * engines, the deterministic seed for minhash/simhash permutations.
    * Spark side is the codegen'd [[PolyHash31]] (byte loop == ascii-char loop
    * because every hashed string is cleaned ASCII). */
  def charHash(s: Column): Column = PolyHash.polyHash31(s)
  def charHashSql(s: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length($s)+1), i -> CAST(ascii(substr($s, i, 1)) AS BIGINT))), (acc, x) -> (acc*31 + x) % 1000000007)"

  /** DuckDB mirror of [[PolyHash.hashBytes2]] — the independent base-131
    * fold supplying SimHash60's bits 30-59. */
  def charHash2Sql(s: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(1, length($s)+1), i -> CAST(ascii(substr($s, i, 1)) AS BIGINT))), (acc, x) -> (acc*131 + x) % 998244353)"

  /** Universal-hash permutation constants for the 8-row minhash signature. */
  val minhashPerms: Seq[(Long, Long)] = Seq(
    (2971L, 1332L), (4297L, 7919L), (6121L, 1511L), (8233L, 2027L),
    (9413L, 4463L), (10667L, 5779L), (12289L, 6841L), (14341L, 8863L))

  /** Per-row 8-permutation minhash signature over a shingle array — dd02's
    * signature with no explode → groupBy shuffle and each shingle hashed
    * exactly once, as the native [[MinHashSig8]] codegen pass. The single
    * definition keeps the batch LSH family (Dedup.lshPairs) and the
    * streaming detector (DocsStream.banded) arithmetically identical. */
  def minhashSig(shs: Column): Column = MinHashSig8.minhashSig8(shs)

  /** The 4 LSH band keys of a signature array (2 rows per band), formatted
    * "b<i>:<mh>:<mh>" — shared by batch banding and the streaming buckets. */
  def bandKeys(sig: Column): Seq[Column] =
    (0 until 4).map { b =>
      concat(lit(s"b$b:"), element_at(sig, 2 * b + 1).cast("string"),
        lit(":"), element_at(sig, 2 * b + 2).cast("string"))
    }

  /** Token-set Jaccard over two distinct-element array columns, rounded to
    * 6 dp so both engines threshold on identical values. */
  def jaccard(a: Column, b: Column): Column =
    round(size(array_intersect(a, b)).cast("double") /
          size(array_union(a, b)).cast("double"), 6)
  def jaccardSql(a: String, b: String): String =
    s"ROUND(CAST(len(list_intersect($a, $b)) AS DOUBLE) / CAST(len(list_distinct(list_concat($a, $b))) AS DOUBLE), 6)"
}
