"""Spark <-> DuckDB parity fuzzer.

Generates random relational plans over the real ``lineitem``/``orders``
fixtures, compiles each plan BOTH ways — a PySpark DataFrame and a DuckDB
SQL string — and compares the results with driver semantics
(order-insensitive, columns sorted by name, exact values).  This is a
randomized meta-test of the engine-parity conventions every hand-written
oracle in the registry relies on (registry.py header): if one of them is
wrong anywhere in the surface the grammar covers, hypothesis finds and
SHRINKS a minimal counterexample instead of a judge finding it in a
shipped oracle.

Grammar scope (v2) — deliberately restricted to what the conventions
claim is parity-exact, while probing the known hazard classes:

* Sources: lineitem scan, lineitem⋈orders inner/left equi-join, and
  EXISTS/NOT EXISTS semi/anti forms.  The LEFT join makes every orders
  column genuinely nullable downstream, so three-valued logic, NULL
  arithmetic, NULL group keys, and null-skipping aggregates are probed
  with real NULLs, not just nullif-injected ones.
* BIGINT arithmetic (add/sub/mul/abs/case/nullif) — every leaf cast to
  BIGINT on both engines (the DuckDB INT32 literal-overflow hazard);
  multiply operands are mod-reduced so no plan can overflow int64
  (Spark with ANSI off wraps silently where DuckDB raises — a real
  divergence the grammar must stay away of, documented here).
* String expressions (upper/lower/substring/concat/length); DuckDB
  ``concat()`` treats NULL as empty string where Spark propagates NULL,
  so concat compiles to ``||``.
* Aggregates count/count-distinct/min/max/sum/avg over int exprs and
  min/max over double columns; integer SUM compiled with an explicit
  ``CAST(.. AS BIGINT)`` (DuckDB widens to HUGEINT → pandas object, the
  known driver-dtype hazard from round 5).
* Window functions rank/dense_rank and sum/min/count over the default
  RANGE-to-current-row frame (emitted explicitly on the DuckDB side),
  ordered ``ASC NULLS FIRST`` on both engines — Spark's asc default is
  nulls-first while DuckDB's is nulls-LAST, so the order must be pinned
  explicitly (that asymmetry is itself a finding the fuzzer encodes).
  row_number is deliberately NOT in the grammar: the fixture has
  duplicate rows, so it is not deterministic under value ties.

Grammar v6 additions (VERDICT r9 item 6):

* HAVING over integer-valued aggregates (the agg expression repeated in
  the HAVING clause — no alias-reference dialect dependence);
* GROUP BY ROLLUP / CUBE (DataFrame rollup()/cube() vs SQL grouping
  sets; super-aggregate NULL rows compared as ordinary values);
* correlated scalar subqueries (SELECT agg FROM orders WHERE
  o_orderkey = l_orderkey): the SAME SQL text runs on both engines —
  Spark side via spark.sql — probing Catalyst's decorrelation;
* the documents table as a text-function namespace (pure-ASCII fixture)
  with trim / replace / strpos(instr) / LIKE added to the expression
  grammar for every namespace.

Grammar v7 additions (round 10, second pass):

* ROWS-k-PRECEDING window frames — aggregating the ORDER EXPRESSION
  itself, so duplicate-row ties are permutation-invariant (a framed
  aggregate of an arbitrary expression is NOT deterministic under the
  fixtures' duplicate rows — deliberate restriction);
* INTERSECT ALL / EXCEPT ALL (bag semantics, intersectAll/exceptAll);
* uncorrelated integer scalar-subquery thresholds in the csub WHERE
  (exact integers only — a double avg() threshold would flip boundary
  rows on summation-order ULP);
* GROUPING() discriminators on every rollup/cube key (the DataFrame
  side pre-projects key expressions — F.grouping rejects
  expression-form keys with GROUPING_COLUMN_MISMATCH).

Grammar v8 additions (round 10, third pass):

* QUALIFY-equivalent top-k-per-group (rank filter over window output —
  rank is tie-stable so the surviving row SET is deterministic where
  row_number would not be);
* date_trunc calendar-bucket group keys, rendered to second-precision
  strings on both sides (the output-format convention);
* ordered string concatenation: Spark array_join(sort_array(
  collect_list)) vs DuckDB string_agg(.. ORDER BY ..), coalesced to ''
  so the all-NULL group matches Spark's empty-array join.
  FINDING #4 (first v8 soak): DuckDB's ordered string_agg loses the
  order in ROLLUP/CUBE super-aggregate rows (sorted partial states are
  merged without re-sort) — the grammar compiles the sort-AFTER-
  aggregation form instead (list_sort over list(), exactly the Spark
  spelling), pinned in test_parity_fuzz.py.

Grammar v8.1/v9 additions: IN-list three-valued semantics (incl. the
NOT-IN-with-NULL-operand class); FILTER-clause aggregates vs the CASE
spelling; DESC window ordering (both engines' defaults are asymmetric
in BOTH directions — ASC pins NULLS FIRST, DESC pins NULLS LAST);
timestamp ± INTERVAL n DAY arithmetic under the string render.

Grammar v10 additions (round 11):

* PIVOT: DataFrame groupBy().pivot(col, values).agg() vs the portable
  CASE-form spelling (agg(CASE WHEN pcol = v THEN expr END)) — pivot
  columns renamed p0..pN on both sides so the compare never rides on
  engine-specific pivot column naming; explicit values lists over the
  fixed-domain TPC-H flag columns; integer aggregates only.
* UNPIVOT: DataFrame unpivot/melt vs the UNION-ALL-per-column spelling.
  NOTE: Spark's DataFrame unpivot KEEPS null measure values while SQL
  UNPIVOT defaults to EXCLUDE NULLS — the UNION ALL spelling matches
  the DataFrame (null-keeping) semantics exactly, which is why it is
  the oracle form.
* LATERAL: `FROM lineitem, LATERAL (SELECT aggs FROM orders WHERE
  o_orderkey = l_orderkey) t` — the SAME SQL text on both engines
  (aggregate laterals return exactly one row, so join multiplicity is
  deterministic); probes Catalyst's lateral-subquery decorrelation.
* Nested scalar subqueries: a correlated scalar subquery whose WHERE
  carries an UNCORRELATED scalar-subquery threshold (min/max + delta)
  — two decorrelation layers in one expression, same SQL both engines;
  integer aggregates only (double thresholds flip boundary rows on
  summation-order ULP).

Grammar v10.1 additions (round 11, second pass):

* boolean aggregates bool_and/bool_or over grammar predicates (Spark
  F.bool_and/F.bool_or; empty-after-FILTER and all-NULL groups yield
  NULL on both engines);
* date-part extraction as integer expressions: year/month/day/hour of
  a timestamp column (identical part semantics; NOTE dayofweek is
  deliberately EXCLUDED — Spark numbers Sunday=1, DuckDB Sunday=0);
* exact-median aggregate over integer expressions: both engines
  interpolate the even-count midpoint, and integer .5 halves are
  exactly representable, so the double results are bit-identical.

Grammar v11 additions (round 11, third pass):

* string pad/repeat/translate: lpad/rpad with NON-EMPTY pad strings —
  ``lpad(s, n, '')`` is an error-vs-value asymmetry (Spark returns the
  input unchanged, DuckDB raises "Insufficient padding in LPAD"; pinned
  in test_parity_fuzz.py::test_lpad_empty_pad_asymmetry); repeat with
  n >= 0; translate with DISTINCT from-chars and a to-string that may
  be shorter (delete semantics agree, probed incl. delete-all).
* calendar interval arithmetic: ts ± n MONTH / YEAR under the string
  render — end-of-month clamping agrees on both engines (Jan 31 + 1
  month = Feb 29/28 both; probed at ±25 months, ±2 years); the DuckDB
  side keeps the sign-safe ``(n) * INTERVAL 1 MONTH`` spelling.
* quantile aggregates beyond median: percentile(e, p) vs
  quantile_cont(e, p) for p ∈ {0.1, 0.25, 0.5, 0.75, 0.9} over INTEGER
  expressions — both engines interpolate at rank (n-1)·p and the
  interpolation fractions are exact binary values, so integer inputs
  produce bit-identical doubles (probed incl. rollup super-aggregate
  rows, where the holistic state merge could have diverged).
* GROUP BY GROUPING SETS explicit form: the Spark 4 DataFrame
  ``groupingSets()`` API vs the SQL clause, with drawn subset lists
  (incl. the empty set).  Spark emits ZERO rows over an empty input
  exactly like rollup/cube — the same finding-#3 ``HAVING count(*) >
  0`` guard applies.
* named WINDOW clauses: one SQL text on both engines — two named
  windows (unframed for rank/dense_rank, ROWS-k-PRECEDING framed for
  the order-expression aggregates), probing the window-clause resolver
  rather than inline OVER specs.

Grammar v12 additions (round 11, third pass cont.):

* split_part (NON-empty literal delimiters; beyond-last-part yields ''
  on both engines) and array-element access of split():
  ``F.get(arr, i)`` (0-based, NULL out-of-range) ↔ DuckDB ``arr[i+1]``
  (1-based, NULL out-of-range).  NOTE ``getItem``/``[]`` on the Spark
  side RAISES ArrayIndexOutOfBoundsException under ANSI mode where
  DuckDB returns NULL — an error-vs-value asymmetry; the grammar
  compiles the NULL-tolerant ``get()`` form (probe-verified identical
  incl. out-of-range).
* greatest/least binary forms — BOTH engines skip NULL operands
  (NULL only when all operands are NULL); probed through nullif
  operands.
* fixed-duration HOUR/MINUTE interval shifts joining the v11
  MONTH/YEAR calendar shifts under the string render.
* lead/lag with literal defaults over the ORDER EXPRESSION itself
  (peer runs carry equal values, so the emitted multiset is
  permutation-invariant under duplicate rows — the v7 tie rule
  extended to offset functions).
* EXISTS / NOT EXISTS inside a CASE select-list expression — one SQL
  text on both engines, probing Catalyst's decorrelation of
  select-list existence subqueries.

Grammar v13 additions (round 11, third pass cont.):

* percent_rank / cume_dist window functions — rank-based, hence
  tie-stable under the fixtures' duplicate rows; their double results
  are single divisions of exact integers (bit-identical);
* TRY_CAST of grammar strings to BIGINT.  VALUE-divergence exclusion
  discovered by probe: DuckDB TRY_CAST('12.5' AS BIGINT) ROUNDS to 13
  where Spark's try_cast yields NULL (integral-format-only parser) —
  pinned in test_try_cast_decimal_string_divergence.  v13 relied on the
  alphabets being unable to produce non-integral numerals; v18's hex
  producers broke that (FINDING #8), so since v20 the DuckDB twin
  carries an explicit integral-lexical guard instead of an
  unreachability argument;
* regexp_extract over a fixed safe pattern set (char-class + group —
  Java regex and RE2 agree on this subset; no-match yields '' on BOTH
  engines, NULL propagates);
* datediff in days between a date literal and a cast timestamp column.

Grammar v21 additions (round 11, fifth pass):

* RANGE-k-PRECEDING window frames over the integer order expression.
  Value-based bounds include ALL peers of every in-range order value,
  so — unlike ROWS frames — aggregating an ARBITRARY grammar
  expression is permutation-safe under duplicate rows; the framed
  aggregate set is sum/min/count of int_exprs.  NULL order keys form a
  single peer island whose frame is exactly the island on BOTH engines
  (probed: identical sums for the null rows under ASC NULLS FIRST).
* multi-column COUNT DISTINCT via an explicit struct/row.  The BARE
  multi-arg form is a pinned VALUE divergence: Spark count(DISTINCT
  a, b) drops rows where ANY argument is NULL (ANSI), DuckDB wraps the
  pair in a never-NULL struct and counts it (probed 2 vs 4 on a
  NULL-bearing fixture) — so the grammar compiles countDistinct(
  struct(a, b)) <-> COUNT(DISTINCT (a, b)), which agree for every NULL
  shape incl. (NULL, NULL).  Pinned in
  test_multi_arg_count_distinct_null_divergence.
* array set-ops over split() token arrays (union/intersect/except),
  deduped + sorted + re-joined to a string.  Spark's
  array_union/array_intersect/array_except all emit DISTINCT elements
  and propagate a NULL operand; the DuckDB twins
  (list_concat/list_intersect/list_filter-not-contains under
  list_distinct + list_sort) need an EXPLICIT NULL guard — probed:
  DuckDB list_concat treats a NULL operand as empty ('a,b' where Spark
  yields NULL) and list_filter over a NULL probe list drops every
  element ([] where Spark yields NULL); the CASE guard makes both
  engines emit NULL.  (list_distinct also drops NULL ELEMENTS where
  array_distinct keeps them — unreachable here: split() arrays never
  contain NULL elements.)
* UNION ALL BY NAME: side B projects the SAME aliases in REVERSED
  order; Spark's DataFrame unionByName resolves by name, DuckDB via
  the BY NAME modifier (probed identical).

Grammar v24 additions (round 11, fifth pass cont.):

* [NOT] IN (SELECT ...) subqueries as ONE SQL text — the null-aware
  (anti) join physical paths, with NULL injection into the subquery
  output via nullif on a constant the key space actually hits: the
  ANSI three-valued rule (a NOT IN over a NULL-bearing set emits ZERO
  rows) probed identical on both engines before wiring, and the fuzz
  keeps both binders honest across drawn inner/outer predicates.

Grammar v25 additions (round 12):

* "gsub" — a correlated scalar subquery used AS A GROUPING EXPRESSION
  (GROUP BY ordinals list the subquery itself).  The bare grouped-
  select-list form is an ERROR on BOTH engines (probed: Spark
  SCALAR_SUBQUERY_IS_IN_GROUP_BY_OR_AGGREGATE_FUNCTION, DuckDB Binder
  Error "must appear in the GROUP BY clause") — the portable form
  probes both decorrelators under GROUP BY, where the subquery is
  functionally dependent on the kmod key.
* "exneq" — [NOT] EXISTS with a correlated RANGE predicate (BETWEEN
  over the outer key ± drawn deltas): the non-equi existence-join
  physical paths (Spark plans a broadcast-nested-loop semi/anti where
  the equi forms hash), one SQL text on both engines.
* "aggwin" — window functions over the AGGREGATE relation (window-
  after-agg pipeline order).  The group key is unique per output row,
  so ORDER BY (v, g) is total and row_number — banned everywhere else
  in the grammar because the fixtures carry duplicate rows — is
  deterministic here; rank/dense_rank/running-sum ride the same order;
  v's direction pins ASC NULLS FIRST / DESC NULLS LAST per v9 and the
  DuckDB running sum casts its HUGEINT back to BIGINT.

Grammar v26 additions (round 12, second pass):

* three-way join sources "ijc"/"ljc" (lineitem ⋈ orders ⋈ customer on
  the o_custkey hop): join REORDERING gets real freedom, and the left
  form makes customer columns nullable through TWO hops.
* "latlim" — correlated LATERAL subquery with ORDER BY + LIMIT k: the
  lateral top-k physical path (DuckDB unnests to a window; Spark plans
  a decorrelated rank filter).  Deterministic because the projected
  value IS the order column (ASC NULLS FIRST pinned).
* PROBED, NOT WIRED: HAVING EXISTS correlated on a grouping expression
  errors on BOTH engines — DuckDB with a clean binder error, Spark 4
  with an INTERNAL analyzer error (MISSING_ATTRIBUTES, SQLSTATE XX000
  — the outer reference is rewritten to the group key alias but the
  EXISTS filter keeps the pre-aggregation attribute).  Pinned in
  test_parity_fuzz.py as an error-class asymmetry.

Grammar v23 additions (round 11, fifth pass cont.):

* "topk" plan shape — ORDER BY (expr, unique-key) LIMIT n: the sort /
  limit physical paths (TakeOrderedAndProject vs DuckDB top-n) were
  previously unfuzzed.  The unique-key tiebreak makes the selected ROW
  SET deterministic (the compare is orderless, so only set identity is
  asserted); ASC pins NULLS FIRST, DESC pins NULLS LAST (the v9
  direction-default asymmetry).
* "aggall" plan shape — GROUP BY ALL as ONE SQL text on both engines
  (the csub/winnamed discipline, so the key/agg pieces stay inside the
  dialect-portable subset): probes both binders' resolution of
  all-non-aggregate-select-items, incl. constant select items (probed:
  both group by the constant).
* any_value over a FUNCTIONALLY-DEPENDENT expression (an affine map of
  the first kmod group key): every row in a group carries the same
  value, so the nondeterministic pick is deterministic by
  construction — both engines' any_value paths get coverage without a
  tie policy.

Grammar v22 additions (round 11, fifth pass cont.):

* TWO-SIDED window frames: ROWS j PRECEDING .. m FOLLOWING over the
  ORDER EXPRESSION (tie rows interchangeable -> multiset permutation-
  invariant, the v7 rule), and RANGE j PRECEDING .. m FOLLOWING over
  ARBITRARY expressions (value bounds include all peers, the v21
  rule).
* DISTINCT ordered string concatenation: Spark
  array_join(sort_array(collect_set(s)), '|') <-> DuckDB
  coalesce(array_to_string(list_sort(list(DISTINCT s)), '|'), '').
  collect_set SKIPS NULLs at aggregation while DuckDB's list(DISTINCT)
  keeps one NULL element — parity holds because array_to_string skips
  NULL elements; the all-NULL group renders NULL in DuckDB vs '' in
  Spark, closed by the strjoin coalesce rule (probed).
* arg-max/arg-min of an integer expression BY the source's unique key
  (lineitem: l_orderkey*8 + l_linenumber; events: event_id; documents:
  doc_id — uniqueness is what makes the picked row deterministic).
  NULL-VALUE asymmetry probed and pinned: DuckDB arg_max SKIPS rows
  whose VALUE is NULL while Spark max_by returns the max-key row's
  NULL; the twin NULLs the ordering key when the value is NULL
  (max_by ignores NULL keys), which makes both engines skip —
  test_arg_max_null_value_divergence.

Grammar v20 additions (round 11, fourth pass cont.):

* HAVING over STRING-valued aggregates (min/max of string exprs
  compared to literals — byte-order on the ASCII fixtures; a NULL
  aggregate, reachable via all-NULL jstr groups, drops the row on
  both engines, mirroring the v6 integer-HAVING NULL rule).

FINDING #8 (first v20 soak): DuckDB TRY_CAST to BIGINT parses exponent
('1E5' -> 100000), decimal ('.5' -> 1 ROUNDED) and 0x-hex forms Spark's
integral-only try_cast rejects — reachable once v18's to_hex/md5
producers (or an 'e' drawn from column text between digit substrings
of timestamp renders) enter the trycast operand space.  The twin now
guards DuckDB with regexp_full_match(trim(s), '[+-]?[0-9]+') — probed
equal to Spark across every lexical class incl. whitespace trim,
signs, leading zeros and int64 overflow; pinned in
test_try_cast_nonintegral_lexical_forms_divergence.

FINDING #7 (first v20 soak — surfaced by v19's kstr wrapper, which let
two grammar-distinct keys compile to the SAME expression): a
TWIN-COMPILE artifact, not an engine divergence.  Grouping on raw
expression TEXT collapses duplicated keys in DuckDB (ROLLUP(x, x)
binds the duplicate BY EXPRESSION: its output column stays non-NULL
and GROUPING() reads 0 in the middle set) while Spark's compile
pre-projects keys into distinct k0/k1 columns that keep their
positions (k1 NULL, flag 1).  Fixed by PRE-PROJECTING on the DuckDB
side too (subquery with k{i} aliases — both engines then agree even
for duplicated expressions, probed); the raw-text form's divergence is
pinned in test_duplicate_rollup_key_grouping_artifact.

Grammar v19 additions (round 11, fourth pass cont.):

* string-space control flow: CASE over grammar predicates returning
  strings, COALESCE with a literal default, and string IN-lists as
  predicates (NULL semantics identical — probed through the new
  nullable-string leaf);
* JSON STRING extraction as a string leaf (get_json_object ↔
  json_extract_string; missing key -> NULL on both) — the grammar's
  first NULLABLE string source, which is what makes scoal/IN-list
  NULL propagation reachable;
* custom-char trims.  btrim(str, chars) has the SAME argument order on
  both engines; the two-parameter ltrim/rtrim orders are FLIPPED —
  Spark's legacy form is (trimStr, str) while DuckDB's is (str, chars)
  — same-text would silently trim the wrong operand, so the compilers
  emit each engine's order (pinned in
  test_two_param_ltrim_argument_order_divergence);
* substring with NEGATIVE start positions (count from the end;
  beyond-length clamps identically — probed at -7/'hello').  START=0
  is a VALUE divergence: Spark treats 0 like 1 where DuckDB consumes a
  position ('he' vs 'h') — excluded, pinned in
  test_substring_start_zero_divergence;
* GROUP BY an arbitrary grammar STRING expression (the group-key
  space previously held only raw columns / int mods / calendar
  truncs).

Grammar v18 additions (round 11, fourth pass cont.):

* integer division/modulo with COLUMN divisors through a nullif(b, 0)
  guard.  ERROR-vs-VALUE asymmetry (probed, the getItem class): a zero
  divisor RAISES under ANSI Spark but quietly returns NULL in DuckDB
  (// and % both) — the guard makes both engines emit NULL, pinned in
  test_integer_division_zero_divisor_asymmetry;
* chr() of 32 + |x| % 95 (printable ASCII; Spark char = DuckDB chr,
  probed incl. the boundary chars 32/126);
* regexp_replace over the v13 safe pattern subset.  VALUE-divergence
  exclusion (probed): DuckDB regexp_replace replaces the FIRST match
  only by default where Spark replaces ALL occurrences — the twin
  compiles DuckDB's 'g' flag; the bare same-text form is pinned in
  test_regexp_replace_default_flag_divergence;
* split-array length: size(split(s, d)) = len(regexp_split_to_array)
  (both count trailing empty fields identically — probed);
* string MIN/MAX aggregates (byte order over the ASCII fixtures) and
  COUNT(DISTINCT string-expr).
* NOT encodable: ntile / row_number — both split peer rows by
  partition-order position, so duplicate order keys make the output
  multiset depend on the physical row order (the v7 tie rule's exact
  failure mode; rank/dense_rank/percent_rank/cume_dist/nth_value stay
  the encodable subset).

Grammar v17 additions (round 11, fourth pass):

* integer division (Spark ``div`` = DuckDB ``//`` — BOTH truncate
  toward zero, probed on negative dividends/divisors) and integer
  modulo with NONZERO literal divisors (both engines keep the sign of
  the dividend — Java and C semantics agree; zero divisors excluded:
  ANSI Spark RAISES where DuckDB returns NULL — pinned under v18);
* md5 / sha256 digests of grammar strings (lowercase hex on both
  engines — the portable-hash discipline the dedup family rides,
  probed bit-identical) and hex() of integer expressions (UPPERCASE,
  no zero-pad, two's-complement 16-digit form for negatives on BOTH
  engines incl. hex(-1) and hex(0) — probed);
* dayofyear / weekofyear date parts (ISO week on both engines,
  probed across the week-53 boundary: weekofyear('2027-01-01') = 53
  both);
* bit_and / bit_or / bit_xor AGGREGATES over integer expressions
  (exact two's-complement folds, order-independent);
* nth_value(order-expr, n) over the full frame — tie-stable because
  ties carry equal values, so position n's value is invariant under
  peer permutation (the v12 offset-function rule applied to frames).

Grammar v16 additions (round 11, third pass cont.):

* sqrt under min/max (IEEE-correctly-rounded on both engines — unlike
  ln/exp/log, sqrt is a required-exact IEEE-754 operation);
* bit_count and sign() of integer expressions;
* floor/ceil of double-column arithmetic (identical IEEE inputs ->
  identical integers);
* left()/right() with NON-NEGATIVE lengths and concat_ws (NULL-skip on
  both engines).  VALUE-divergence exclusion: left('hello', -2) is ''
  in Spark but 'hel' (all-but-last-2, the Postgres negative-length
  semantics) in DuckDB — pinned in
  test_left_negative_length_divergence.

Grammar v15 additions (round 11, third pass cont.):

* levenshtein distance between grammar strings (identical DP semantics,
  probed on the ASCII fixtures), ascii() of the first char, string
  reverse;
* array_contains/list_contains membership over split() token arrays as
  a predicate;
* calendar additions: quarter as a date part, WEEK as a date_trunc
  bucket (both engines truncate to Monday), last_day month-end render.
  initcap is NOT encodable — DuckDB has no initcap function.

Grammar v14 additions (round 11, third pass cont.):

* bitwise AND/OR/XOR (two's-complement-identical incl. negative
  operands) and left/right shifts with small non-negative literal
  counts (negative / >=64 counts are engine-defined — excluded).
  Left-shift operands take abs(): DuckDB << RAISES on a negative LHS
  ("Cannot left-shift negative number") where Spark shiftleft wraps
  Java semantics — an error-vs-value asymmetry caught by the first
  v15 soak; >> accepts negatives identically (probed);
* integer cubes through libm pow() on mod-97-reduced bases — every
  reachable value is an exact small integer, so the double result and
  its BIGINT cast are bit-identical (a NON-integer exponent or large
  base would ride libm rounding — excluded by construction);
* sorted-list-slice aggregation: sort_array + slice + array_join vs
  list_sort + [1:k] + array_to_string with the NULL-skip FILTER twin
  (Spark collect_list SKIPS NULLs, DuckDB list() KEEPS them — the
  strjoin precedent applied to integer lists);
* double modulo: Spark's % on doubles is the exact IEEE remainder
  (C fmod), compiled to DuckDB's % OPERATOR inside min().
  FINDING #6 (first v14 soak): DuckDB's fmod() FUNCTION is NOT its %
  operator — fmod computes a - trunc(a/b)*b with each step rounded
  (fmod(20.0, 0.03) = 0.0199999999999995…74 vs 20.0 % 0.03 =
  0.02000000000000074 = C fmod = Spark %).  Pinned in
  test_duckdb_fmod_function_vs_operator_divergence.
* NOT encodable (probed): months_between — Spark returns a fractional
  31-day-month quotient, DuckDB datediff('month') counts calendar
  boundaries; no portable twin exists, so the class stays out.

FINDING #5 (surfaced by the v11-reseeded in-suite run; latent in the
grammar since v10): Spark's DataFrame pivot pre-aggregates by
(key, pivot-col) and emits NULL for a (key, value) cell with NO ROWS,
while the flat CASE-form ``count(CASE WHEN pcol = v THEN e END)``
returns 0 — count is the only aggregate that distinguishes the absent
cell from a cell whose rows all carry NULL measures (0 on both engines
for the latter).  The oracle compiles the portable twin — NULL exactly
when ``count(CASE WHEN pcol = v THEN 1 END) = 0`` — pinned in
test_parity_fuzz.py::test_spark_pivot_empty_cell_count_divergence.

Usage:
    python tools/parityfuzz.py [--examples 200] [--sf-dir /root/testdata/sf0.001]

Exit 0 if every example matches; prints the shrunk failing plan and
exits 1 otherwise.  ``tests/test_parity_fuzz.py`` runs a bounded number
of examples in the suite.
"""

from __future__ import annotations

from hypothesis import strategies as st

LI_INT = ["l_orderkey", "l_partkey", "l_suppkey", "l_linenumber"]
LI_DBL = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
LI_STR = ["l_returnflag", "l_linestatus"]
ORD_INT = ["o_orderkey", "o_custkey"]
ORD_DBL = ["o_totalprice"]
ORD_STR = ["o_orderstatus", "o_orderpriority"]

LI_TS = ["l_shipdate"]
ORD_TS = ["o_orderdate"]
CU_INT = ["c_custkey", "c_nationkey"]
CU_DBL = ["c_acctbal"]
CU_STR = ["c_name", "c_mktsegment"]
EV_INT = ["event_id", "user_id"]
EV_DBL = ["value"]
EV_STR = ["event_type"]
EV_TS = ["ts"]
# rate-like doubles (|v| <= ~0.4): the only valid second operand of the Q1
# SUM(a * (1 - b)) decimal pattern — with a large-magnitude b, DuckDB's
# decimal multiply raises an overflow where Spark widens to DECIMAL(38,8)
# and succeeds (fuzzer finding #2; pinned in
# test_duckdb_decimal_multiply_overflow_asymmetry)
RATE_DBL = ["l_discount", "l_tax"]

# "uk": a UNIQUE integer key expression (same text both engines) — what
# makes v22 arg-max/arg-min deterministic.  lineitem: l_linenumber is
# 1..7 so l_orderkey*8 + l_linenumber is injective; joins keep lineitem
# rows unique (o_orderkey is unique).
_LI_UK = "(l_orderkey * 8 + l_linenumber)"
_LI_NS = {"ints": LI_INT, "strs": LI_STR, "dbls": LI_DBL, "tss": LI_TS, "json": [],
          "uk": _LI_UK, "uk_unique": False}
_BOTH_NS = {
    "ints": LI_INT + ORD_INT,
    "strs": LI_STR + ORD_STR,
    "dbls": LI_DBL + ORD_DBL,
    "tss": LI_TS + ORD_TS,
    "json": [],
    "uk": _LI_UK, "uk_unique": False,
}
# v26 three-way join namespace (lineitem ⋈ orders ⋈ customer): the
# customer attributes ride two join hops, so join REORDERING and (in
# the left form) two layers of nullability are probed; uk stays the
# non-unique lineitem key (affine arg values per FINDING #10).
_TRI_NS = {
    "ints": LI_INT + ORD_INT + CU_INT,
    "strs": LI_STR + ORD_STR + CU_STR,
    "dbls": LI_DBL + ORD_DBL + CU_DBL,
    "tss": LI_TS + ORD_TS,
    "json": [],
    "uk": _LI_UK, "uk_unique": False,
}

# events: timestamps, a continuous double, and a JSON props column —
# ("jint", col, key) probes JSON-path extraction parity
# (get_json_object <-> json_extract_string, both return the raw string;
# missing key -> NULL on both engines)
_EV_NS = {
    "ints": EV_INT,
    "strs": EV_STR,
    "dbls": EV_DBL,
    "tss": EV_TS,
    "json": [("props", "k"), ("props", "missing")],
    "uk": "event_id", "uk_unique": True,
}
_MUL_MOD = 100_003  # keeps any product well under 2^63

# documents: the text-function namespace (grammar v6).  The fixture text
# is pure ASCII (measured), so case/substr/strpos semantics are
# byte-identical across engines; no dbl/ts columns -> the strategies
# guard on empty lists.
_DOC_NS = {
    "ints": ["doc_id", "n_chars"],
    "strs": ["lang", "source", "text"],
    "dbls": [],
    "tss": [],
    "json": [],
    "uk": "doc_id", "uk_unique": True,
}

# back-compat aliases (v1 names)
INT_COLS, DBL_COLS, STR_COLS = LI_INT, LI_DBL, LI_STR


# ---------------------------------------------------------------------------
# strategies (plans are plain nested tuples: hashable, shrinkable)
# ---------------------------------------------------------------------------

_NEEDLES = ["a", "e", "s", "th", "an", "sc", "q", " "]


def int_exprs(depth: int = 3, ns=_LI_NS):
    leaf = st.one_of(
        st.sampled_from(ns["ints"]).map(lambda c: ("icol", c)),
        st.integers(min_value=-5, max_value=100).map(lambda v: ("ilit", v)),
        # epoch-µs extraction (the integer-time-arithmetic convention);
        # mod-reduced at the leaf so epoch magnitudes (~1.7e15 µs) can't
        # push downstream SUM/mul chains past int64
        *(
            [st.sampled_from(ns["tss"]).map(lambda c: ("epochus", c))]
            if ns["tss"]
            else []
        ),
        *(
            # v10.1: calendar part extraction (dayofweek deliberately
            # excluded — Spark Sunday=1 vs DuckDB Sunday=0)
            [st.tuples(st.just("datepart"),
                       st.sampled_from(["year", "month", "day", "hour",
                                        "quarter",
                                        # v17: ISO parts (probed incl.
                                        # the week-53 boundary)
                                        "dayofyear", "weekofyear"]),
                       st.sampled_from(ns["tss"]))]
            if ns["tss"]
            else []
        ),
        *(
            [st.sampled_from(ns["json"]).map(lambda ck: ("jint", ck[0], ck[1]))]
            if ns["json"]
            else []
        ),
    )
    if depth <= 0:
        return leaf
    sub = int_exprs(depth - 1, ns)
    return st.one_of(
        leaf,
        st.tuples(st.sampled_from(["add", "sub", "mul"]), sub, sub),
        st.tuples(st.just("abs"), sub),
        st.tuples(st.just("case"), preds(depth - 1, ns), sub, sub),
        st.tuples(st.just("nullif"), sub, st.integers(min_value=0, max_value=9)),
        st.tuples(st.just("len"), str_exprs(depth - 1, ns)),
        # v6: 1-based first-occurrence position, 0 when absent (Spark
        # instr <-> DuckDB strpos, identical incl. NULL propagation)
        st.tuples(st.just("strpos"), str_exprs(depth - 1, ns), st.sampled_from(_NEEDLES)),
        # v12: greatest/least skip NULL operands on BOTH engines (NULL
        # only when every operand is NULL) — probed through nullif
        st.tuples(st.sampled_from(["great", "least"]), sub, sub),
        # v15: Levenshtein distance + ascii-of-first-char (ASCII fixtures)
        st.tuples(st.just("lev"), str_exprs(depth - 1, ns), str_exprs(depth - 1, ns)),
        st.tuples(st.just("ascii"), str_exprs(depth - 1, ns)),
        # v16: bit_count + sign of integer expressions
        st.tuples(st.just("bcount"), sub),
        st.tuples(st.just("isign"), sub),
        # v16: floor/ceil of double-column arithmetic (identical IEEE
        # inputs -> identical integers on both engines)
        *(
            [st.tuples(st.sampled_from(["dfloor", "dceil"]),
                       st.sampled_from(ns["dbls"]),
                       st.integers(min_value=2, max_value=9))]
            if ns["dbls"]
            else []
        ),
        # v13: TRY_CAST of a grammar string (integral-or-reject parity —
        # the decimal-format '12.5' class where DuckDB ROUNDS and Spark
        # NULLs is unreachable from the grammar's alphabets; pinned)
        st.tuples(st.just("trycast"), str_exprs(depth - 1, ns)),
        # v14: bitwise ops (two's-complement-identical, negatives
        # included) + shifts with small non-negative literal counts
        st.tuples(st.sampled_from(["band", "bor", "bxor"]), sub, sub),
        st.tuples(st.sampled_from(["shl", "shr"]), sub,
                  st.integers(min_value=0, max_value=6)),
        # v14: integer cube via libm pow on a mod-97 base — exact small
        # integers only, so double + BIGINT cast are bit-identical
        st.tuples(st.just("cube3"), sub),
        # v13: day difference between a date literal and the ts column
        *(
            [st.tuples(st.just("ddiff"), st.sampled_from(ns["tss"]),
                       st.sampled_from(["2025-01-01", "2025-06-15", "2026-03-01"]))]
            if ns["tss"]
            else []
        ),
        # v17: integer division / modulo with NONZERO literal divisors —
        # Spark div = DuckDB // (trunc toward zero) and % keeps the
        # dividend's sign on both (probed); zero divisors excluded
        # (Spark ANSI raises where DuckDB NULLs — the v18 pin)
        st.tuples(st.sampled_from(["idiv", "imod"]), sub,
                  st.sampled_from([-7, -3, -2, 2, 3, 5, 7])),
        # v18: COLUMN divisors through nullif(b, 0) — zero divisor ->
        # NULL on both engines (the error class guarded into a value)
        st.tuples(st.sampled_from(["idivc", "imodc"]), sub, sub),
        # v18: length of the split array (trailing empties counted
        # identically — probed)
        st.tuples(st.just("alen"), str_exprs(depth - 1, ns),
                  st.sampled_from([" ", "a", "e"])),
    )


def str_exprs(depth: int = 2, ns=_LI_NS):
    leaf = st.one_of(
        st.sampled_from(ns["strs"]).map(lambda c: ("scol", c)),
        st.text(alphabet="ANRFO x", min_size=0, max_size=4).map(lambda s: ("slit", s)),
        # v19: JSON string extraction — the grammar's first NULLABLE
        # string source (missing key -> NULL on both engines)
        *(
            [st.sampled_from(ns["json"]).map(lambda ck: ("jstr", ck[0], ck[1]))]
            if ns["json"]
            else []
        ),
        # second-precision timestamp render (the output-format convention)
        *(
            [st.sampled_from(ns["tss"]).map(lambda c: ("tsfmt", c))]
            if ns["tss"]
            else []
        ),
        # v9: interval arithmetic — ts ± n days rendered to the string
        # contract (UTC session, day-time interval: identical on both)
        *(
            [st.tuples(st.just("tsshift"), st.sampled_from(ns["tss"]),
                       st.integers(min_value=-30, max_value=30))]
            if ns["tss"]
            else []
        ),
    )
    if depth <= 0:
        return leaf
    sub = str_exprs(depth - 1, ns)
    return st.one_of(
        leaf,
        st.tuples(st.sampled_from(["upper", "lower", "trim"]), sub),
        st.tuples(
            st.just("substr"),
            sub,
            # v19: negative starts count from the end on BOTH engines
            # (beyond-length clamps identically, probed).  START=0 is a
            # pinned VALUE divergence (Spark 0==1, DuckDB consumes a
            # position) — excluded.
            st.sampled_from([-3, -2, -1, 1, 2, 3]),
            st.integers(min_value=0, max_value=4),
        ),
        st.tuples(st.just("concat"), sub, sub),
        # v6: literal replace (NON-EMPTY needle — replace(s, '', x)
        # diverges across engines by definition choices)
        st.tuples(
            st.just("replace"), sub, st.sampled_from(_NEEDLES),
            st.text(alphabet="xy_", min_size=0, max_size=2),
        ),
        # v11: pad with a NON-EMPTY pad string — lpad(s, n, '') is an
        # error-vs-value asymmetry (Spark: input unchanged; DuckDB:
        # raises), pinned in test_lpad_empty_pad_asymmetry
        st.tuples(
            st.sampled_from(["lpad", "rpad"]), sub,
            st.integers(min_value=0, max_value=6),
            st.sampled_from(["x", "xy", "_"]),
        ),
        # v11: repeat n >= 0 (n = 0 -> '' on both engines)
        st.tuples(st.just("srepeat"), sub, st.integers(min_value=0, max_value=3)),
        # v11: translate with DISTINCT from-chars; to-string may be
        # shorter (unmapped chars DELETE identically on both engines)
        st.tuples(
            st.just("xlate"), sub,
            st.sampled_from(["aes", "an ", "sc", "thx"]),
            st.sampled_from(["", "x", "xy", "x_z"]),
        ),
        # v13: regexp_extract over a fixed Java/RE2-agreeing pattern
        # subset; no-match -> '' on both engines, NULL propagates
        st.tuples(
            st.just("rext"), sub,
            st.sampled_from(["([a-z]+)", "([0-9]+)", "([aeiou])", "(a[a-z])"]),
        ),
        # v15: string reverse; month-end date render
        st.tuples(st.just("srev"), sub),
        # v16: left/right with NON-NEGATIVE lengths (negative lengths
        # are a VALUE divergence: Spark '' vs DuckDB all-but-last-N —
        # pinned in test_left_negative_length_divergence); concat_ws
        # skips NULL operands on both engines
        st.tuples(st.sampled_from(["sleft", "sright"]), sub,
                  st.integers(min_value=0, max_value=8)),
        st.tuples(st.just("cws"), sub, sub),
        *(
            [st.sampled_from(ns["tss"]).map(lambda c: ("lastday", c))]
            if ns["tss"]
            else []
        ),
        # v11: calendar interval arithmetic under the string render —
        # month/year shifts clamp end-of-month identically; v12 adds the
        # fixed-duration hour/minute units
        *(
            [st.tuples(st.just("tsshiftcal"), st.sampled_from(ns["tss"]),
                       st.integers(min_value=-25, max_value=25),
                       st.sampled_from(["month", "year", "hour", "minute"]))]
            if ns["tss"]
            else []
        ),
        # v12: split_part (non-empty literal delimiter; beyond-last ->
        # '' on both engines)
        st.tuples(st.just("spart"), sub, st.sampled_from([" ", "a", "e"]),
                  st.integers(min_value=1, max_value=5)),
        # v12: array element of split() — F.get (0-based, NULL OOR) vs
        # [i+1] (1-based, NULL OOR); getItem would RAISE under ANSI
        st.tuples(st.just("selem"), sub, st.sampled_from([" ", "a", "e"]),
                  st.integers(min_value=0, max_value=4)),
        # v17: portable digests (lowercase hex both engines) + hex() of
        # an integer expression (uppercase, no zero-pad, 16-digit
        # two's-complement for negatives — probed identical)
        st.tuples(st.just("md5h"), sub),
        st.tuples(st.just("sha256h"), sub),
        st.tuples(st.just("ihex"), int_exprs(depth - 1, ns)),
        # v18: printable-ASCII chr (Spark char = DuckDB chr, probed)
        st.tuples(st.just("schr"), int_exprs(depth - 1, ns)),
        # v19: string CASE / COALESCE-with-default / custom-char trims
        # (btrim arg order shared; l/rtrim orders flipped per engine)
        st.tuples(st.just("scase"), preds(depth - 1, ns), sub, sub),
        st.tuples(st.just("scoal"), sub, st.sampled_from(["", "dflt", "x"])),
        st.tuples(st.sampled_from(["btr", "ltr", "rtr"]), sub,
                  st.sampled_from(["x", "xy", " ", "Ax"])),
        # v18: regexp_replace over the v13 safe pattern subset — the
        # DuckDB twin carries the 'g' flag (bare DuckDB form replaces
        # only the FIRST match; pinned divergence)
        st.tuples(st.just("sregrep"), sub,
                  st.sampled_from(["[a-z]+", "[0-9]+", "[aeiou]", "a[a-z]"]),
                  st.sampled_from(["", "X", "_z"])),
        # v21: array set-ops over split() token arrays — deduped,
        # sorted, re-joined.  Spark array_union/intersect/except emit
        # DISTINCT elements and NULL-propagate; the DuckDB twins carry
        # an explicit NULL guard (list_concat treats NULL as empty,
        # list_filter over a NULL probe drops all — probed).
        st.tuples(st.just("aset"),
                  st.sampled_from(["union", "inter", "exc"]), sub, sub),
    )


def preds(depth: int = 2, ns=_LI_NS):
    cmp_ops = ["<", "<=", "=", "<>", ">", ">="]
    # depth-0 operand strategies: preds() is called from int_exprs(), so
    # non-terminal operands here would recurse int_exprs <-> preds forever
    leaf = st.one_of(
        st.tuples(st.just("icmp"), st.sampled_from(cmp_ops), int_exprs(0, ns), int_exprs(0, ns)),
        st.tuples(st.just("scmp"), st.sampled_from(["=", "<>", "<", ">="]), str_exprs(0, ns), str_exprs(0, ns)),
        # isnull over a shallow nullif so the predicate actually sees NULLs
        st.tuples(
            st.just("isnull"),
            st.tuples(st.just("nullif"), int_exprs(0, ns), st.integers(min_value=0, max_value=9)),
        ),
        # v6: LIKE with %/_ wildcards (identical semantics + NULL
        # propagation on both engines; patterns stay quote-free)
        st.tuples(
            st.just("like"),
            str_exprs(0, ns),
            st.sampled_from(_NEEDLES),
            st.sampled_from(["%{}%", "{}%", "%{}", "%{}_%"]),
        ),
        # v15: token membership over split() arrays (array_contains vs
        # list_contains — identical boolean + NULL propagation).  NOT
        # drawn for same-SQL-text namespaces (csub/casex/winnamed): the
        # two spellings are dialect-specific, so one shared text can't
        # carry them (first v15 soak caught the leak).
        *(
            [st.tuples(st.just("acontains"), str_exprs(0, ns),
                       st.sampled_from(_NEEDLES))]
            if not ns.get("same_text")
            else []
        ),
        # v8.1: IN-list — three-valued semantics (a NULL operand makes
        # IN yield NULL, and NOT(IN) then filters the row out on both
        # engines; reachable via not() + nullif/jint operands)
        st.tuples(
            st.just("inlist"),
            int_exprs(0, ns),
            st.lists(st.integers(min_value=-2, max_value=9),
                     min_size=1, max_size=4, unique=True).map(tuple),
        ),
        # v19: string IN-list (same three-valued semantics; reachable
        # NULL operands via the jstr leaf)
        st.tuples(
            st.just("sinlist"),
            str_exprs(0, ns),
            st.lists(st.sampled_from(["A", "N", "R", "F", "O", "x", ""]),
                     min_size=1, max_size=3, unique=True).map(tuple),
        ),
    )
    if depth <= 0:
        return leaf
    sub = preds(depth - 1, ns)
    return st.one_of(
        leaf,
        st.tuples(st.sampled_from(["and", "or"]), sub, sub),
        st.tuples(st.just("not"), sub),
    )


def agg_specs(ns=_LI_NS):
    opts = [
        st.just(("count_star",)),
        st.tuples(st.sampled_from(["count", "countd", "min", "max", "sum", "avg"]), int_exprs(2, ns)),
        # v8: ordered string concatenation — collect_list order is
        # nondeterministic so the Spark side sorts the array first;
        # binary UTF-8 ordering both sides, NULLs skipped both sides
        st.tuples(st.just("strjoin"), st.sampled_from(ns["strs"])),
        # v8.1: FILTER-clause aggregates — the DataFrame side compiles
        # the CASE form (sum/min/max skip NULLs; count counts non-NULL),
        # the SQL side the ANSI FILTER (WHERE ...) clause: a semantic-
        # equivalence probe of the two spellings
        st.tuples(
            st.sampled_from(["fcnt", "fsumi", "fmaxi"]),
            int_exprs(1, ns), preds(1, ns),
        ),
        # v10.1: boolean aggregates over grammar predicates
        st.tuples(st.sampled_from(["ball", "bany"]), preds(1, ns)),
        # v10.1: exact median of an integer expression (interpolated
        # even-count midpoints are integer halves — exactly representable)
        st.tuples(st.just("medi"), int_exprs(1, ns)),
        # v11: interpolated quantiles beyond the median — percentile vs
        # quantile_cont over INTEGER exprs at rank (n-1)·p.  BINARY
        # fracs ONLY (FINDING #9, first v20-era soak): the engines use
        # algebraically-equal but IEEE-DIFFERENT interpolation formulas
        # — Spark lower + f·(upper-lower), DuckDB (1-f)·lower + f·upper
        # — which agree exactly when f is a quarter (every product and
        # sum lands on the k/4 grid below 2^53) but drift 1 ulp for
        # f = 0.1/0.9 on SOME operand pairs (377/2289 day-groups at
        # sf0.001 — starkest on EQUAL values, where DuckDB's form lands
        # OUTSIDE the data range; many pairs coincide, which is why
        # v11's soaks stayed green until the v20 key-space reshuffle —
        # the grammar-growth-reprobes lesson again).
        # Pinned in test_quantile_interpolation_formula_divergence.
        st.tuples(st.just("quanti"), int_exprs(1, ns),
                  st.sampled_from([0.25, 0.5, 0.75])),
        # v14: sorted-list-slice concat of an integer expr — NULL-skip
        # FILTER twin (Spark collect_list skips NULLs, DuckDB list()
        # keeps them), sort AFTER aggregation per finding #4
        st.tuples(st.just("ljoin"), int_exprs(1, ns),
                  st.integers(min_value=1, max_value=6)),
        # v17: bitwise aggregates — exact two's-complement folds,
        # order-independent, identical names on both engines
        st.tuples(st.sampled_from(["abit_and", "abit_or", "abit_xor"]),
                  int_exprs(1, ns)),
        # v18: string MIN/MAX (byte order on the ASCII fixtures, probed
        # incl. leading space and mixed case) + COUNT(DISTINCT str)
        st.tuples(st.sampled_from(["mins", "maxs", "countd_s"]),
                  str_exprs(1, ns)),
        # v21: multi-column COUNT DISTINCT via an explicit struct/row —
        # the bare multi-arg form is a pinned VALUE divergence (Spark
        # drops rows where ANY argument is NULL per ANSI; DuckDB wraps
        # the pair in a never-NULL struct and counts it), so both
        # engines compile the struct form, which agrees for every NULL
        # shape incl. (NULL, NULL).
        st.tuples(st.just("countd2"), int_exprs(1, ns), int_exprs(1, ns)),
        # v22: DISTINCT ordered string concat — collect_set skips NULLs,
        # list(DISTINCT) keeps one NULL element that array_to_string
        # skips; all-NULL group closed by the strjoin coalesce rule
        st.tuples(st.just("sjoind"), str_exprs(1, ns)),
    ]
    if ns.get("uk") and ns.get("uk_unique"):
        # v22: arg-max/arg-min BY the source's unique key — determinism
        # comes from key uniqueness; the twin NULLs the key when the
        # VALUE is NULL (DuckDB arg_max skips null values, Spark max_by
        # would surface them — pinned divergence)
        opts.append(
            st.tuples(st.sampled_from(["amax", "amin"]), int_exprs(1, ns),
                      st.just(ns["uk"]))
        )
    elif ns.get("uk"):
        # v25.1 / FINDING #10 (first v25 soak): the lineitem "uk"
        # (l_orderkey*8 + l_linenumber) is NOT unique — the synthetic
        # fixture carries ~1.1k duplicated (orderkey, linenumber) pairs
        # with DIFFERING other columns, so arg_max of an arbitrary
        # expression genuinely diverged under ROLLUP state merge
        # (spark=98 duck=114; a GRAMMAR determinism bug, not an engine
        # bug — pinned in test_parity_fuzz.py).  For these namespaces
        # the arg value is an AFFINE MAP OF THE KEY (the v23 anyf
        # trick): key ties agree on the value, so the arg_max/max_by
        # physical paths — incl. rollup/cube partial-state merges —
        # stay covered with a deterministic pick.
        opts.append(
            st.tuples(st.sampled_from(["amaxf", "aminf"]),
                      st.integers(min_value=-5, max_value=5).filter(bool),
                      st.integers(min_value=-9, max_value=9),
                      st.just(ns["uk"]))
        )
    if ns["dbls"]:
        opts += [
            st.tuples(st.sampled_from(["mind", "maxd"]), st.sampled_from(ns["dbls"])),
            # v14: double modulo (Spark % on doubles = IEEE fmod = DuckDB
            # fmod; identical inputs -> identical remainders) under min()
            st.tuples(st.just("mindmod"), st.sampled_from(ns["dbls"]),
                      st.sampled_from([0.03, 0.07, 1.5])),
            # v16: sqrt is IEEE-correctly-rounded (unlike ln/exp) —
            # min/max of identical doubles are bit-identical
            st.tuples(st.sampled_from(["minsqrt", "maxsqrt"]),
                      st.sampled_from(ns["dbls"])),
            # the double-SUM/AVG convention: DECIMAL(18,4) partial sums, cast
            # back to double — exact decimal arithmetic, no summation-order ULP
            st.tuples(st.sampled_from(["sumd4", "avgd4"]), st.sampled_from(ns["dbls"])),
        ]
    if set(RATE_DBL) <= set(ns["dbls"]):
        # the TPC-H Q1 shape: SUM(a * (1 - b)) in DECIMAL; b must be a
        # bounded rate column (see RATE_DBL note)
        opts.append(
            st.tuples(st.just("sumd4prod"), st.sampled_from(ns["dbls"]), st.sampled_from(RATE_DBL))
        )
    return st.one_of(*opts)


def group_keys(ns=_LI_NS):
    opts = [
        st.sampled_from(ns["strs"]).map(lambda c: ("scol", c)),
        st.tuples(st.just("kmod"), st.sampled_from(ns["ints"]), st.integers(min_value=2, max_value=7)),
        # v19: GROUP BY an arbitrary string expression (dialect-specific
        # spellings inside — not for same-SQL-text namespaces)
        *(
            [st.tuples(st.just("kstr"), str_exprs(1, ns))]
            if not ns.get("same_text")
            else []
        ),
    ]
    if "l_linenumber" in ns["ints"]:
        opts.append(st.just(("icol", "l_linenumber")))
    if ns["tss"]:
        # v8: calendar-bucket group keys — date_trunc rendered to the
        # second-precision STRING both sides (the output-format
        # convention; raw timestamp outputs would ride the driver's
        # dtype mapping instead of the pinned contract)
        opts.append(st.tuples(
            st.just("ktrunc"), st.sampled_from(ns["tss"]),
            st.sampled_from(["day", "week", "month", "year"]),
        ))
    return st.one_of(*opts)


def win_funcs(ns=_LI_NS):
    return st.one_of(
        st.just(("rank",)),
        st.just(("dense_rank",)),
        st.tuples(st.sampled_from(["wsum", "wmin", "wcount"]), int_exprs(1, ns)),
        # v12: lead/lag with literal defaults, applied to the ORDER
        # EXPRESSION itself (peer runs carry equal values -> the emitted
        # multiset is permutation-invariant under the fixtures'
        # duplicate rows; an arbitrary expression would not be)
        st.tuples(st.sampled_from(["wlag", "wlead"]),
                  st.integers(min_value=1, max_value=3),
                  st.integers(min_value=-9, max_value=9)),
        # v13: rank-based distribution functions — tie-stable; single
        # integer divisions, bit-identical doubles
        st.just(("wpct",)),
        st.just(("wcume",)),
        # v17: nth_value of the ORDER EXPRESSION over the full frame —
        # ties carry equal values, so position n is permutation-stable
        st.tuples(st.just("wnth"), st.integers(min_value=1, max_value=4)),
    )


_SOURCES = [("li",), ("ij",), ("lj",), ("semi",), ("anti",), ("ev",), ("doc",),
            ("ijc",), ("ljc",)]

# integer-valued aggregate ops: safe HAVING comparands (bigint both
# sides; a NULL comparand — empty FILTER group — drops the row on both)
_INT_AGGS = {"count_star", "count", "countd", "min", "max", "sum",
             "fcnt", "fsumi", "fmaxi",
             "abit_and", "abit_or", "abit_xor", "countd_s", "countd2",
             "amax", "amin", "amaxf", "aminf"}

# correlated scalar subquery inner aggregates (grammar v6): orders
# aggregated per outer l_orderkey.  count over an empty group is 0 on
# both engines (scalar subquery with no rows -> NULL, BUT count(*)
# still returns 0 for an aggregate over zero rows — identical rule in
# Spark and DuckDB); min/max/sum over empty -> NULL on both.
_CSUB_AGGS = [
    ("cnt",),
    ("maxi", "o_custkey"), ("mini", "o_custkey"), ("sumi", "o_custkey"),
    ("maxd", "o_totalprice"), ("mind", "o_totalprice"),
]

# csub runs ONE SQL text on both engines, so its outer predicate must
# stay inside the dialect-portable subset: no ts (epoch_us vs
# unix_micros), no json (json_extract_string vs get_json_object), and
# depth 1 so strpos/len nonterminals (instr vs strpos) can't appear.
_CSUB_NS = {"ints": LI_INT, "strs": LI_STR, "dbls": [], "tss": [], "json": [],
            "same_text": True}

# v10 PIVOT columns: fixed-domain TPC-H flag columns with explicit value
# lists (pivot needs deterministic output columns; values outside the
# list fall into no bucket on both engines, NULL pivot keys likewise)
_PIVOT_COLS = {
    "li": [("l_returnflag", ("A", "N", "R")), ("l_linestatus", ("F", "O"))],
    "semi": [("l_returnflag", ("A", "N", "R")), ("l_linestatus", ("F", "O"))],
    "anti": [("l_returnflag", ("A", "N", "R")), ("l_linestatus", ("F", "O"))],
    "ij": [
        ("l_returnflag", ("A", "N", "R")), ("l_linestatus", ("F", "O")),
        ("o_orderstatus", ("F", "O", "P")),
    ],
    "lj": [
        ("l_returnflag", ("A", "N", "R")), ("l_linestatus", ("F", "O")),
        ("o_orderstatus", ("F", "O", "P")),
    ],
}

# v10 nested-scalar-subquery / lateral inner integer aggregates
_CSUB2_INNER = ["cnt", "maxi", "mini"]


@st.composite
def plans(draw):
    src = draw(st.sampled_from(_SOURCES))
    ns = (
        _BOTH_NS if src[0] in ("ij", "lj")
        else _TRI_NS if src[0] in ("ijc", "ljc")
        else _EV_NS if src[0] == "ev"
        else _DOC_NS if src[0] == "doc"
        else _LI_NS
    )
    where = draw(st.none() | preds(2, ns))
    shapes = ["proj", "agg", "win", "aggroll", "csub", "winq",
              "lat", "csub2", "unpivot", "winnamed", "casex", "topk",
              "insub", "gsub", "exneq", "aggwin", "latlim"]
    if src[0] == "li":
        shapes.append("aggall")
    if src[0] in _PIVOT_COLS:
        shapes.append("pivot")
    shape = draw(st.sampled_from(shapes))
    if shape == "topk":
        # v23: ORDER BY (expr, unique key) LIMIT n — deterministic row
        # set via the uk tiebreak; direction defaults pinned per v9
        return ("topk", src, where, draw(int_exprs(2, ns)),
                draw(st.integers(min_value=1, max_value=40)),
                draw(st.sampled_from(["asc", "desc"])), ns["uk"])
    if shape == "aggall":
        # v23: GROUP BY ALL — one SQL text both engines, portable subset
        keys = draw(st.lists(st.one_of(
            st.sampled_from(LI_STR).map(lambda c: ("scol", c)),
            st.tuples(st.just("kmod"), st.sampled_from(LI_INT),
                      st.integers(min_value=2, max_value=7)),
        ), min_size=1, max_size=2, unique=True))
        iaggs = draw(st.lists(
            st.sampled_from(["cnt"] + [f"sum:{c}" for c in LI_INT]
                            + [f"max:{c}" for c in LI_INT]),
            min_size=1, max_size=2, unique=True))
        return ("aggall", tuple(keys), tuple(iaggs),
                draw(st.none() | preds(1, _CSUB_NS)))
    if shape == "insub":
        # v24: [NOT] IN subquery, one SQL text; nullc injects NULLs
        # into the subquery output (small orderkeys are mostly present)
        return ("insub", draw(st.booleans()),
                draw(st.none()
                     | st.tuples(st.integers(min_value=2, max_value=5),
                                 st.integers(min_value=0, max_value=4))),
                draw(st.none() | st.integers(min_value=1, max_value=40)
                     | st.just(999999)),
                draw(st.none() | preds(1, _CSUB_NS)))
    if shape == "gsub":
        # v25: correlated scalar subquery AS A GROUPING EXPRESSION —
        # the bare grouped-select-list form errors on BOTH engines
        # (probed: Spark SCALAR_SUBQUERY_IS_IN_GROUP_BY_OR_AGGREGATE_
        # FUNCTION, DuckDB Binder Error), so the portable form lists
        # the subquery in GROUP BY (ordinals 1, 3) — the subquery is
        # functionally dependent on the kmod key, so the grouping is
        # unchanged and both decorrelators must agree under GROUP BY
        return ("gsub", draw(st.integers(min_value=2, max_value=7)),
                draw(st.sampled_from(["cnt", "maxi", "mini", "sumi"])),
                draw(st.none()
                     | st.tuples(st.integers(min_value=2, max_value=5),
                                 st.integers(min_value=0, max_value=4))),
                draw(st.none() | preds(1, _CSUB_NS)))
    if shape == "exneq":
        # v25: [NOT] EXISTS with a correlated RANGE predicate (BETWEEN
        # over the outer key) — the non-equi existence-join physical
        # paths, one SQL text on both engines
        return ("exneq", draw(st.booleans()),
                draw(st.integers(min_value=0, max_value=8)),
                draw(st.integers(min_value=0, max_value=8)),
                draw(st.none()
                     | st.tuples(st.integers(min_value=2, max_value=5),
                                 st.integers(min_value=0, max_value=4))),
                draw(st.none() | preds(1, _CSUB_NS)))
    if shape == "latlim":
        # v26: LATERAL with ORDER BY + LIMIT — deterministic because the
        # projected value IS the order column (ties carry equal values)
        return ("latlim", draw(st.integers(min_value=1, max_value=3)),
                draw(st.none()
                     | st.tuples(st.integers(min_value=2, max_value=5),
                                 st.integers(min_value=0, max_value=4))),
                draw(st.none() | preds(1, _CSUB_NS)))
    if shape == "aggwin":
        # v25: window AFTER aggregation — the group key is unique per
        # output row, so (v, g) is a total order and row_number (banned
        # everywhere else: duplicate fixture rows) is deterministic here
        return ("aggwin", src, where, draw(group_keys(ns)),
                draw(st.one_of(
                    st.just(("cnt",)),
                    st.tuples(st.sampled_from(["sumi", "maxi", "mini"]),
                              st.sampled_from(ns["ints"])),
                )),
                draw(st.sampled_from(
                    ["row_number", "rank", "dense_rank", "rnsum"])),
                draw(st.sampled_from(["asc", "desc"])))
    if shape == "pivot":
        # v10: explicit-values PIVOT vs the CASE-form spelling; pivot
        # output columns renamed p0..pN on both sides
        pcol, pvals = draw(st.sampled_from(_PIVOT_COLS[src[0]]))
        key = draw(group_keys(ns))
        agg = draw(st.tuples(
            st.sampled_from(["count", "min", "max", "sum"]), int_exprs(1, ns)
        ))
        return ("pivot", src, where, key, (pcol, pvals), agg)
    if shape == "unpivot":
        # v10: DataFrame unpivot (null-KEEPING melt) vs UNION-ALL-per-
        # column — the null-keeping oracle spelling
        key = draw(group_keys(ns))
        cols = draw(st.lists(st.sampled_from(ns["ints"]),
                             min_size=2, max_size=3, unique=True))
        return ("unpivot", src, where, key, tuple(cols))
    if shape == "lat":
        # v10: aggregate LATERAL subquery — same SQL text both engines
        inner_mod = draw(
            st.none()
            | st.tuples(st.integers(min_value=2, max_value=5),
                        st.integers(min_value=0, max_value=4))
        )
        return ("lat", inner_mod, draw(st.none() | preds(1, _CSUB_NS)))
    if shape == "csub2":
        # v10: nested scalar subqueries — correlated outer layer with an
        # uncorrelated integer threshold layer inside
        inner = draw(st.sampled_from(_CSUB2_INNER))
        op = draw(st.sampled_from(["<", "<=", ">", ">=", "<>"]))
        iagg = draw(st.sampled_from(["min", "max"]))
        delta = draw(st.integers(min_value=-5, max_value=5))
        return ("csub2", inner, op, iagg, delta,
                draw(st.none() | preds(1, _CSUB_NS)))
    if shape == "casex":
        # v12: EXISTS / NOT EXISTS inside a CASE select-list expression —
        # one SQL text both engines (Catalyst select-list decorrelation)
        inner_mod = draw(
            st.none()
            | st.tuples(st.integers(min_value=2, max_value=5),
                        st.integers(min_value=0, max_value=4))
        )
        return ("casex", draw(st.booleans()), inner_mod,
                draw(st.none() | preds(1, _CSUB_NS)))
    if shape == "winnamed":
        # v11: named WINDOW clauses — one SQL text on both engines, so
        # every piece must stay dialect-portable (fixed lineitem source;
        # keys/preds from the _CSUB_NS portable subset, like csub)
        pkey = draw(st.one_of(
            st.sampled_from(LI_STR).map(lambda c: ("scol", c)),
            st.tuples(st.just("kmod"), st.sampled_from(LI_INT),
                      st.integers(min_value=2, max_value=7)),
        ))
        ocol = draw(st.sampled_from(LI_INT))
        delta = draw(st.integers(min_value=-5, max_value=5))
        k = draw(st.integers(min_value=0, max_value=4))
        wfs = draw(st.lists(
            st.sampled_from([("rank",), ("dense_rank",),
                             ("nwsum",), ("nwmin",), ("nwcount",)]),
            min_size=1, max_size=3, unique=True))
        return ("winnamed", pkey, ocol, delta, k, tuple(wfs),
                draw(st.none() | preds(1, _CSUB_NS)))
    if shape == "winq":
        # v8: QUALIFY-equivalent — top-k-per-group via a rank filter over
        # the window output (rank is tie-stable, so the SURVIVING ROW SET
        # is deterministic even though row_number would not be).
        # v9: optional DESC direction — Spark's desc default is NULLS
        # LAST while DuckDB's DESC default is NULLS FIRST (the inverse
        # of the ASC asymmetry), so the SQL side pins DESC NULLS LAST.
        pkey = draw(group_keys(ns))
        oexpr = draw(int_exprs(2, ns))
        k = draw(st.integers(min_value=1, max_value=5))
        direction = draw(st.sampled_from(["asc", "desc"]))
        return ("winq", src, where, pkey, oexpr, k, direction)
    if shape == "csub":
        # correlated scalar subquery (v6): fixed lineitem outer shape;
        # both engines run the SAME SQL text (Spark side via spark.sql).
        # v7 adds an optional UNCORRELATED integer scalar-subquery
        # threshold conjunct in the outer WHERE (exact integers only —
        # a double avg() threshold would flip boundary rows on
        # summation-order ULP).
        inner = draw(st.sampled_from(_CSUB_AGGS))
        inner_mod = draw(
            st.none()
            | st.tuples(st.integers(min_value=2, max_value=5),
                        st.integers(min_value=0, max_value=4))
        )
        thr = draw(
            st.none()
            | st.tuples(
                st.sampled_from(["<", "<=", ">", ">=", "<>"]),
                st.sampled_from(["maxi", "mini", "cnt"]),
            )
        )
        return (
            "csub", inner, inner_mod, draw(st.none() | preds(1, _CSUB_NS)), thr,
        )
    if shape == "aggroll":
        # ROLLUP/CUBE grouping sets (v6); v7 adds GROUPING() flags so
        # super-aggregate rows are discriminated from real NULL keys;
        # v11 adds the EXPLICIT GROUPING SETS form (DataFrame
        # groupingSets() vs the SQL clause) with drawn subset lists
        mode = draw(st.sampled_from(["rollup", "cube", "gsets"]))
        keys = draw(st.lists(group_keys(ns), min_size=1, max_size=2, unique=True))
        aggs = draw(st.lists(agg_specs(ns), min_size=1, max_size=3))
        if mode == "gsets":
            powerset = [
                tuple(i for i in range(len(keys)) if m >> i & 1)
                for m in range(1 << len(keys))
            ]
            # two validity constraints, both error-vs-value asymmetries
            # caught by the first v11 soaks (Spark's groupingSets API
            # accepts both; DuckDB's binder rejects both):
            # (a) at least one NON-empty subset — GROUPING SETS (())
            #     plus a GROUPING() flag is "GROUPING without groups"
            #     in DuckDB while Spark emits the grand-total row with
            #     flag 1 (pinned in
            #     test_grouping_sets_all_empty_asymmetry);
            # (b) every key must appear in >= 1 subset — Spark treats
            #     every listed column as a grouping column (flag 1 on
            #     all rows when never grouped), DuckDB rejects
            #     GROUPING(expr) for an expression absent from every
            #     grouping set ("must be a grouping column").
            subsets = draw(
                st.lists(st.sampled_from(powerset),
                         min_size=1, max_size=3, unique=True)
                .filter(lambda ls: any(ls))
                .filter(lambda ls: set().union(*ls) == set(range(len(keys))))
            )
            mode = ("gsets", tuple(subsets))
        return ("aggroll", mode, src, where, tuple(keys), tuple(aggs))
    if shape == "agg":
        keys = draw(st.lists(group_keys(ns), min_size=0, max_size=2, unique=True))
        aggs = draw(st.lists(agg_specs(ns), min_size=1, max_size=3))
        if keys and keys[0][0] == "kmod" and draw(st.booleans()):
            # v23: any_value over an affine map of the FIRST kmod key —
            # functionally dependent, so the pick is deterministic
            aggs = aggs + [(
                "anyf", keys[0],
                draw(st.integers(min_value=1, max_value=5)),
                draw(st.integers(min_value=0, max_value=9)),
            )]
        having = None
        int_idx = [i for i, a in enumerate(aggs) if a[0] in _INT_AGGS]
        str_idx = [i for i, a in enumerate(aggs) if a[0] in ("mins", "maxs")]
        if keys and int_idx and draw(st.booleans()):
            # HAVING over an integer-valued aggregate (v6)
            having = (
                "h",
                draw(st.sampled_from(["<", "<=", "=", "<>", ">", ">="])),
                draw(st.sampled_from(int_idx)),
                draw(st.integers(min_value=0, max_value=50)),
            )
        elif keys and str_idx and draw(st.booleans()):
            # v20: HAVING over a STRING aggregate — byte-order
            # comparisons on the ASCII fixtures; a NULL aggregate (the
            # all-NULL jstr group) drops the row on both engines
            having = (
                "hs",
                draw(st.sampled_from(["<", "<=", "=", "<>", ">", ">="])),
                draw(st.sampled_from(str_idx)),
                draw(st.sampled_from(["A", "N", "R", "F", "O", "x", "", " z"])),
            )
        return ("agg", src, where, tuple(keys), tuple(aggs), having)
    if shape == "win":
        pkey = draw(group_keys(ns))
        oexpr = draw(int_exprs(2, ns))
        # v7: optional ROWS-k-PRECEDING frame.  ROWS frames are order-
        # sensitive within ties and the fixtures carry duplicate rows,
        # so the framed variant aggregates the ORDER EXPRESSION ITSELF —
        # tie members are interchangeable then, making the result
        # permutation-invariant (rank/dense_rank ignore frames).
        frame = draw(
            st.none()
            | st.tuples(st.just("rows"), st.integers(min_value=0, max_value=4))
            | st.tuples(st.just("range"), st.integers(min_value=0, max_value=6))
            # v22: two-sided frames — (kind, j PRECEDING, m FOLLOWING)
            | st.tuples(st.just("rows2"), st.integers(min_value=0, max_value=3),
                        st.integers(min_value=0, max_value=3))
            | st.tuples(st.just("range2"), st.integers(min_value=0, max_value=4),
                        st.integers(min_value=0, max_value=4))
        )
        if frame is not None and frame[0] in ("rows", "rows2"):
            wfs = draw(st.lists(
                st.sampled_from([("fsum",), ("fmin",), ("fcount",)]),
                min_size=1, max_size=2, unique=True))
            return ("win", src, where, pkey, oexpr, tuple(wfs), frame)
        if frame is not None:
            # v21 RANGE frame: value-based bounds include ALL peers of
            # every in-range order value, so aggregating an ARBITRARY
            # expression is permutation-safe (ROWS frames are not);
            # NULL order keys form one peer island on both engines
            wfs = draw(st.lists(
                st.tuples(st.sampled_from(["rsum", "rmin", "rcount"]),
                          int_exprs(1, ns)),
                min_size=1, max_size=2))
            return ("win", src, where, pkey, oexpr, tuple(wfs), frame)
        wfs = draw(st.lists(win_funcs(ns), min_size=1, max_size=3))
        return ("win", src, where, pkey, oexpr, tuple(wfs), None)
    projs = draw(
        st.lists(st.one_of(int_exprs(3, ns), str_exprs(2, ns)), min_size=1, max_size=4)
    )
    if draw(st.booleans()):
        return ("proj", src, where, tuple(projs))
    # set operation: same projection over two differently-filtered scans
    # of the same source — probes NULL-equality in DISTINCT/set semantics
    # (set ops treat NULLs as equal on both engines, unlike `=`).
    # v7 adds the multiset (ALL) forms — bag semantics with per-row
    # multiplicity arithmetic.
    # v21 "ubyname": side B emits the same aliases in REVERSED order;
    # Spark unionByName resolves by name, DuckDB via UNION ALL BY NAME
    kind = draw(st.sampled_from(
        ["union", "uniondist", "intersect", "except",
         "intersectall", "exceptall", "ubyname"]))
    where_b = draw(st.none() | preds(2, ns))
    return ("setop", kind, src, where, where_b, tuple(projs))


# ---------------------------------------------------------------------------
# Spark compiler
# ---------------------------------------------------------------------------

def _sp_int(e):
    from pyspark.sql import functions as F

    op = e[0]
    if op == "icol":
        return F.col(e[1]).cast("long")
    if op == "ilit":
        return F.lit(e[1]).cast("long")
    if op == "add":
        return _sp_int(e[1]) + _sp_int(e[2])
    if op == "sub":
        return _sp_int(e[1]) - _sp_int(e[2])
    if op == "mul":
        return (_sp_int(e[1]) % _MUL_MOD) * (_sp_int(e[2]) % _MUL_MOD)
    if op == "abs":
        return F.abs(_sp_int(e[1]))
    if op == "case":
        return F.when(_sp_pred(e[1]), _sp_int(e[2])).otherwise(_sp_int(e[3]))
    if op == "nullif":
        a = _sp_int(e[1])
        return F.when(a == F.lit(e[2]), F.lit(None).cast("long")).otherwise(a)
    if op == "len":
        return F.length(_sp_str(e[1])).cast("long")
    if op == "epochus":
        return F.unix_micros(F.col(e[1])) % F.lit(1_000_000_000).cast("long")
    if op == "datepart":
        fn = {"year": F.year, "month": F.month, "day": F.dayofmonth,
              "hour": F.hour, "quarter": F.quarter,
              "dayofyear": F.dayofyear, "weekofyear": F.weekofyear}[e[1]]
        return fn(F.col(e[2])).cast("long")
    if op == "jint":
        return F.get_json_object(F.col(e[1]), f"$.{e[2]}").cast("long")
    if op == "strpos":
        return F.instr(_sp_str(e[1]), e[2]).cast("long")
    if op in ("great", "least"):
        fn = F.greatest if op == "great" else F.least
        return fn(_sp_int(e[1]), _sp_int(e[2]))
    if op in ("band", "bor", "bxor"):
        a, b = _sp_int(e[1]), _sp_int(e[2])
        return {"band": a.bitwiseAND(b), "bor": a.bitwiseOR(b),
                "bxor": a.bitwiseXOR(b)}[op]
    if op in ("shl", "shr"):
        # operand mod-reduced like mul: unbounded shifts would push
        # downstream SUMs past int64 (HUGEINT-vs-wrap divergence).
        # shl additionally takes abs(): DuckDB << RAISES on a negative
        # LHS where Spark shiftleft wraps Java semantics (caught by the
        # first v15 soak, pinned in
        # test_duckdb_negative_left_shift_asymmetry); >> accepts
        # negatives identically on both engines.
        a = _sp_int(e[1]) % _MUL_MOD
        if op == "shl":
            return F.shiftleft(F.abs(a), e[2]).cast("long")
        return F.shiftright(a, e[2]).cast("long")
    if op == "cube3":
        return F.pow(_sp_int(e[1]) % 97, F.lit(3)).cast("long")
    if op == "lev":
        # operands capped at 48 chars: levenshtein is O(n*m) PER ROW and
        # the documents fixture carries multi-KB texts — an uncapped
        # draw of lev(text, text) costs minutes per plan (v20 soak
        # pathology), while the cap keeps the DP under 48^2 with
        # identical semantics on both engines (left() is parity-exact
        # for non-negative lengths, v16)
        return F.levenshtein(
            F.left(_sp_str(e[1]), F.lit(48)), F.left(_sp_str(e[2]), F.lit(48))
        ).cast("long")
    if op == "bcount":
        return F.bit_count(_sp_int(e[1])).cast("long")
    if op == "isign":
        return F.signum(_sp_int(e[1])).cast("long")
    if op == "dfloor":
        return F.floor(F.col(e[1]) / F.lit(e[2])).cast("long")
    if op == "dceil":
        return F.ceil(F.col(e[1]) * F.lit(e[2])).cast("long")
    if op == "ascii":
        return F.ascii(_sp_str(e[1])).cast("long")
    if op == "trycast":
        return _sp_str(e[1]).try_cast("bigint")
    if op == "ddiff":
        return F.datediff(
            F.lit(e[2]).cast("date"), F.col(e[1]).cast("date")
        ).cast("long")
    if op == "idiv":
        # SQL `div` (IntegralDivide): trunc-toward-zero = DuckDB //
        return F.call_function("div", _sp_int(e[1]), F.lit(e[2]).cast("long"))
    if op == "imod":
        return _sp_int(e[1]) % F.lit(e[2]).cast("long")
    if op in ("idivc", "imodc"):
        # v18: column divisor behind nullif(b, 0) — NULL on both engines
        b = _sp_int(e[2])
        guarded = F.when(b == 0, F.lit(None).cast("long")).otherwise(b)
        if op == "idivc":
            return F.call_function("div", _sp_int(e[1]), guarded)
        return _sp_int(e[1]) % guarded
    if op == "alen":
        return F.size(F.split(_sp_str(e[1]), e[2])).cast("long")
    raise ValueError(op)


def _sp_str(e):
    from pyspark.sql import functions as F

    op = e[0]
    if op == "scol":
        return F.col(e[1])
    if op == "slit":
        return F.lit(e[1])
    if op == "upper":
        return F.upper(_sp_str(e[1]))
    if op == "lower":
        return F.lower(_sp_str(e[1]))
    if op == "substr":
        return F.substring(_sp_str(e[1]), e[2], e[3])
    if op == "concat":
        return F.concat(_sp_str(e[1]), _sp_str(e[2]))
    if op == "tsfmt":
        return F.date_format(F.col(e[1]), "yyyy-MM-dd HH:mm:ss")
    if op == "tsshift":
        return F.date_format(
            F.col(e[1]) + F.expr(f"INTERVAL {e[2]} DAYS"),
            "yyyy-MM-dd HH:mm:ss",
        )
    if op == "trim":
        return F.trim(_sp_str(e[1]))
    if op == "replace":
        return F.replace(_sp_str(e[1]), F.lit(e[2]), F.lit(e[3]))
    if op in ("lpad", "rpad"):
        return (F.lpad if op == "lpad" else F.rpad)(_sp_str(e[1]), e[2], e[3])
    if op == "srepeat":
        return F.repeat(_sp_str(e[1]), e[2])
    if op == "xlate":
        return F.translate(_sp_str(e[1]), e[2], e[3])
    if op == "rext":
        return F.regexp_extract(_sp_str(e[1]), e[2], 1)
    if op == "srev":
        return F.reverse(_sp_str(e[1]))
    if op in ("sleft", "sright"):
        fn = "left" if op == "sleft" else "right"
        return getattr(F, fn)(_sp_str(e[1]), F.lit(e[2]))
    if op == "cws":
        return F.concat_ws("|", _sp_str(e[1]), _sp_str(e[2]))
    if op == "lastday":
        return F.date_format(F.last_day(F.col(e[1])), "yyyy-MM-dd")
    if op == "tsshiftcal":
        unit = {"month": "MONTHS", "year": "YEARS",
                "hour": "HOURS", "minute": "MINUTES"}[e[3]]
        return F.date_format(
            F.col(e[1]) + F.expr(f"INTERVAL {e[2]} {unit}"),
            "yyyy-MM-dd HH:mm:ss",
        )
    if op == "spart":
        return F.split_part(_sp_str(e[1]), F.lit(e[2]), F.lit(e[3]))
    if op == "selem":
        # F.get: NULL out-of-range (getItem RAISES under ANSI — the v12
        # error-vs-value exclusion)
        return F.get(F.split(_sp_str(e[1]), e[2]), e[3])
    if op == "md5h":
        # encode() rather than a string->binary cast: explicit UTF-8
        # bytes on both engines (DuckDB md5 hashes the UTF-8 encoding)
        return F.md5(F.encode(_sp_str(e[1]), "UTF-8"))
    if op == "sha256h":
        return F.sha2(_sp_str(e[1]), 256)
    if op == "ihex":
        return F.hex(_sp_int(e[1]))
    if op == "schr":
        return F.char(32 + F.abs(_sp_int(e[1])) % 95)
    if op == "sregrep":
        return F.regexp_replace(_sp_str(e[1]), e[2], e[3])
    if op == "jstr":
        return F.get_json_object(F.col(e[1]), f"$.{e[2]}")
    if op == "scase":
        return F.when(_sp_pred(e[1]), _sp_str(e[2])).otherwise(_sp_str(e[3]))
    if op == "scoal":
        return F.coalesce(_sp_str(e[1]), F.lit(e[2]))
    if op == "btr":
        # btrim(str, trim): SAME argument order as DuckDB trim(str, chars)
        return F.call_function("btrim", _sp_str(e[1]), F.lit(e[2]))
    if op in ("ltr", "rtr"):
        # Spark's legacy two-param form is (trimStr, str) — FLIPPED vs
        # DuckDB's (str, chars); pinned in
        # test_two_param_ltrim_argument_order_divergence
        fn = "ltrim" if op == "ltr" else "rtrim"
        return F.call_function(fn, F.lit(e[2]), _sp_str(e[1]))
    if op == "aset":
        # v21: all three ops emit DISTINCT elements and NULL-propagate.
        # Operands capped at 120 chars (the lev cap discipline): the
        # DuckDB except twin is list_filter+list_contains — O(n*m) PER
        # ROW, quadratic on full sf0.1 document token arrays.
        fn = {"union": F.array_union, "inter": F.array_intersect,
              "exc": F.array_except}[e[1]]
        return F.array_join(
            F.sort_array(fn(F.split(F.left(_sp_str(e[2]), F.lit(120)), " "),
                            F.split(F.left(_sp_str(e[3]), F.lit(120)), " "))),
            ",")
    raise ValueError(op)


def _sp_pred(p):
    op = p[0]
    if op == "icmp" or op == "scmp":
        side = _sp_int if op == "icmp" else _sp_str
        a, b = side(p[2]), side(p[3])
        return {
            "<": a < b, "<=": a <= b, "=": a == b,
            "<>": a != b, ">": a > b, ">=": a >= b,
        }[p[1]]
    if op == "isnull":
        return _sp_int(p[1]).isNull()
    if op == "acontains":
        from pyspark.sql import functions as F

        return F.array_contains(F.split(_sp_str(p[1]), " "), p[2])
    if op == "like":
        return _sp_str(p[1]).like(p[3].format(p[2]))
    if op == "inlist":
        from pyspark.sql import functions as F

        return _sp_int(p[1]).isin(*[F.lit(v).cast("long") for v in p[2]])
    if op == "sinlist":
        from pyspark.sql import functions as F

        return _sp_str(p[1]).isin(*[F.lit(v) for v in p[2]])
    if op == "and":
        return _sp_pred(p[1]) & _sp_pred(p[2])
    if op == "or":
        return _sp_pred(p[1]) | _sp_pred(p[2])
    if op == "not":
        return ~_sp_pred(p[1])
    raise ValueError(op)


def _sp_key(k):
    from pyspark.sql import functions as F

    if k[0] == "kmod":
        return F.col(k[1]).cast("long") % F.lit(int(k[2]))
    if k[0] == "ktrunc":
        return F.date_format(
            F.date_trunc(k[2], F.col(k[1])), "yyyy-MM-dd HH:mm:ss"
        )
    if k[0] == "kstr":
        return _sp_str(k[1])
    return _sp_int(k) if k[0] == "icol" else _sp_str(k)


def _sp_agg(a):
    from pyspark.sql import functions as F

    op = a[0]
    if op == "count_star":
        return F.count(F.lit(1))
    if op == "strjoin":
        return F.array_join(F.sort_array(F.collect_list(F.col(a[1]))), "|")
    if op in ("fcnt", "fsumi", "fmaxi"):
        guarded = F.when(_sp_pred(a[2]), _sp_int(a[1]))
        if op == "fcnt":
            return F.count(guarded)
        return (F.sum if op == "fsumi" else F.max)(guarded)
    if op in ("ball", "bany"):
        return (F.bool_and if op == "ball" else F.bool_or)(_sp_pred(a[1]))
    if op == "medi":
        return F.median(_sp_int(a[1]))
    if op == "quanti":
        return F.percentile(_sp_int(a[1]), F.lit(a[2]))
    if op == "ljoin":
        return F.array_join(
            F.slice(F.sort_array(F.collect_list(_sp_int(a[1]))), 1, a[2]), ","
        )
    if op in ("abit_and", "abit_or", "abit_xor"):
        fn = {"abit_and": F.bit_and, "abit_or": F.bit_or,
              "abit_xor": F.bit_xor}[op]
        return fn(_sp_int(a[1]))
    if op in ("mins", "maxs"):
        return (F.min if op == "mins" else F.max)(_sp_str(a[1]))
    if op == "countd_s":
        return F.count_distinct(_sp_str(a[1]))
    if op == "countd2":
        # v21: struct form — NULL fields count as distinct values (the
        # bare multi-arg form would drop them; pinned divergence)
        return F.count_distinct(F.struct(_sp_int(a[1]), _sp_int(a[2])))
    if op == "sjoind":
        # v22: collect_set skips NULLs; array_join would skip a NULL
        # element anyway — parity with list(DISTINCT) probed
        return F.array_join(F.sort_array(F.collect_set(_sp_str(a[1]))), "|")
    if op in ("amax", "amin"):
        # v22: NULL the key when the VALUE is NULL so max_by skips the
        # row exactly like DuckDB arg_max (pinned divergence otherwise)
        e = _sp_int(a[1])
        key = F.when(e.isNotNull(), F.expr(a[2]))
        fn = F.max_by if op == "amax" else F.min_by
        return fn(e, key).cast("long")
    if op in ("amaxf", "aminf"):
        # v25.1: non-unique-uk namespaces — value is an affine map of
        # the key, so key ties agree on the value (FINDING #10)
        e = (F.expr(a[3]) * a[1] + a[2]).cast("long")
        fn = F.max_by if op == "amaxf" else F.min_by
        return fn(e, F.expr(a[3])).cast("long")
    if op == "anyf":
        # v23: any_value over an affine map of a group key — every row
        # in the group carries the same value, so the pick is
        # deterministic despite any_value's general nondeterminism
        return F.any_value(_sp_key(a[1]) * a[2] + a[3]).cast("long")
    if op in ("minsqrt", "maxsqrt"):
        fn = F.min if op == "minsqrt" else F.max
        return fn(F.sqrt(F.col(a[1])))
    if op == "mindmod":
        return F.min(F.col(a[1]) % F.lit(a[2]))
    if op in ("mind", "maxd"):
        return (F.min if op == "mind" else F.max)(F.col(a[1]))
    if op == "sumd4":
        return F.sum(F.col(a[1]).cast("decimal(18,4)")).cast("double")
    if op == "avgd4":
        return (
            F.sum(F.col(a[1]).cast("decimal(18,4)")).cast("double")
            / F.count(F.col(a[1]))
        )
    if op == "sumd4prod":
        # scale-reduce the scale-8 product sum to 4 IN DECIMAL before the
        # double cast: DuckDB's DECIMAL->DOUBLE is int128*10^-s computed in
        # floating point, off by up to 1 ulp once the unscaled value
        # exceeds 2^53 — found BY this fuzzer (see test
        # test_duckdb_decimal_to_double_cast_hazard); Spark's BigDecimal
        # cast is correctly rounded.  Fixture doubles carry <=2dp so the
        # 8->4 rescale is exact on both engines.
        d = "decimal(18,4)"
        return (
            F.sum(F.col(a[1]).cast(d) * (F.lit(1).cast(d) - F.col(a[2]).cast(d)))
            .cast("decimal(38,4)")
            .cast("double")
        )
    e = _sp_int(a[1])
    return {
        "count": F.count, "countd": F.count_distinct, "min": F.min,
        "max": F.max, "sum": F.sum, "avg": F.avg,
    }[op](e)


def _sp_source(src, spark, sf_dir: str):
    if src[0] == "ev":
        return spark.read.parquet(f"{sf_dir}/events.parquet")
    if src[0] == "doc":
        return spark.read.parquet(f"{sf_dir}/documents.parquet")
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    if src[0] == "li":
        return li
    ords = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cond = li["l_orderkey"] == ords["o_orderkey"]
    if src[0] in ("ijc", "ljc"):
        # v26: three-way — customer hangs off orders; in the left form
        # BOTH the orders and customer columns are nullable downstream
        cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
        how = "inner" if src[0] == "ijc" else "left"
        return li.join(ords, cond, how).join(
            cust, ords["o_custkey"] == cust["c_custkey"], how
        )
    how = {"ij": "inner", "lj": "left", "semi": "left_semi", "anti": "left_anti"}[src[0]]
    return li.join(ords, cond, how)


def compile_spark(plan, spark, sf_dir: str):
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    if plan[0] in ("csub", "csub2", "lat", "winnamed", "casex", "aggall",
                   "insub", "gsub", "exneq", "latlim"):
        # correlated / nested scalar subqueries + LATERAL + named
        # WINDOW clauses + EXISTS-in-CASE + GROUP BY ALL: SAME SQL text
        # on both engines (views registered per call — lazy, no scan
        # cost until execution)
        for t in ("lineitem", "orders"):
            spark.read.parquet(f"{sf_dir}/{t}.parquet").createOrReplaceTempView(t)
        return spark.sql(compile_sql(plan))

    if plan[0] == "aggwin":
        # v25: window over the AGGREGATE relation; (v, g) is a total
        # order because g (the group key) is unique per row
        _, src, where, key, agg, wfn, direction = plan
        df = _sp_source(src, spark, sf_dir)
        if where is not None:
            df = df.filter(_sp_pred(where))
        op = agg[0]
        if op == "cnt":
            a = F.count(F.lit(1)).cast("long")
        elif op == "sumi":
            a = F.sum(F.col(agg[1]).cast("long")).cast("long")
        elif op == "maxi":
            a = F.max(F.col(agg[1]).cast("long"))
        else:
            a = F.min(F.col(agg[1]).cast("long"))
        g = df.groupBy(_sp_key(key).alias("g")).agg(a.alias("v"))
        vord = (
            F.asc_nulls_first(F.col("v")) if direction == "asc"
            else F.desc_nulls_last(F.col("v"))
        )
        w = Window.orderBy(vord, F.asc_nulls_first(F.col("g")))
        if wfn == "rnsum":
            c = F.sum("v").over(
                w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ).cast("long")
        else:
            c = getattr(F, wfn)().over(w).cast("long")
        return g.select("g", "v", c.alias("r"))

    if plan[0] == "topk":
        _, src, where, expr, n, direction, uk = plan
        df = _sp_source(src, spark, sf_dir)
        if where is not None:
            df = df.filter(_sp_pred(where))
        out = df.select(_sp_int(expr).alias("c0"), F.expr(uk).alias("c1"))
        order = (
            F.asc_nulls_first(F.col("c0")) if direction == "asc"
            else F.desc_nulls_last(F.col("c0"))
        )
        return out.orderBy(order, F.asc(F.col("c1"))).limit(n)

    if plan[0] == "pivot":
        _, src, where, key, (pcol, pvals), agg = plan
        df = _sp_source(src, spark, sf_dir)
        if where is not None:
            df = df.filter(_sp_pred(where))
        fn = {"count": F.count, "min": F.min, "max": F.max, "sum": F.sum}[agg[0]]
        out = (
            df.select(_sp_key(key).alias("k0"), F.col(pcol), _sp_int(agg[1]).alias("__m"))
            .groupBy("k0")
            .pivot(pcol, list(pvals))
            .agg(fn(F.col("__m")))
        )
        # rename pivot-value columns p0..pN (engine naming never compared)
        return out.select(
            F.col("k0"),
            *[F.col(f"`{v}`").cast("long").alias(f"p{i}") for i, v in enumerate(pvals)],
        )

    if plan[0] == "unpivot":
        _, src, where, key, cols = plan
        df = _sp_source(src, spark, sf_dir)
        if where is not None:
            df = df.filter(_sp_pred(where))
        base = df.select(
            _sp_key(key).alias("k0"),
            *[F.col(c).cast("long").alias(c) for c in cols],
        )
        return base.unpivot(["k0"], list(cols), "var", "val")

    if plan[0] == "winq":
        _, src, where, pkey, oexpr, k = plan[:6]
        direction = plan[6] if len(plan) > 6 else "asc"
        df = _sp_source(src, spark, sf_dir)
        if where is not None:
            df = df.filter(_sp_pred(where))
        okey = _sp_int(oexpr)
        order = (
            F.asc_nulls_first(okey) if direction == "asc"
            else F.desc_nulls_last(okey)
        )
        w = Window.partitionBy(_sp_key(pkey)).orderBy(order)
        out = df.select(
            _sp_key(pkey).alias("k0"), okey.alias("o0"),
            F.rank().over(w).cast("long").alias("w0"),
        )
        return out.filter(F.col("w0") <= k)

    if plan[0] == "aggroll":
        _, mode, src, where, keys, aggs = plan
        df = _sp_source(src, spark, sf_dir)
        if where is not None:
            df = df.filter(_sp_pred(where))
        # pre-project the key expressions into real columns: F.grouping()
        # rejects expression-form grouping keys (GROUPING_COLUMN_MISMATCH)
        # but accepts plain columns
        df = df.select("*", *[_sp_key(k).alias(f"k{i}") for i, k in enumerate(keys)])
        kcols = [F.col(f"k{i}") for i in range(len(keys))]
        acols = [_sp_agg(a).alias(f"a{i}") for i, a in enumerate(aggs)] + [
            F.grouping(F.col(f"k{i}")).cast("long").alias(f"g{i}")
            for i in range(len(keys))
        ]
        if isinstance(mode, tuple):  # v11 explicit GROUPING SETS
            _, subsets = mode
            grouped = df.groupingSets(
                [[kcols[i] for i in ss] for ss in subsets], *kcols
            )
        else:
            grouped = df.rollup(*kcols) if mode == "rollup" else df.cube(*kcols)
        return grouped.agg(*acols)

    if plan[0] == "setop":
        _, op, src, wa, wb, projs = plan

        def side(w, reverse=False):
            df = _sp_source(src, spark, sf_dir)
            if w is not None:
                df = df.filter(_sp_pred(w))
            cols = [
                (_sp_int(e) if _is_int_expr(e) else _sp_str(e)).alias(f"c{i}")
                for i, e in enumerate(projs)
            ]
            return df.select(*(cols[::-1] if reverse else cols))

        if op == "ubyname":
            # v21: positional shuffle resolved BY NAME
            return side(wa).unionByName(side(wb, reverse=True))
        a, b = side(wa), side(wb)
        if op == "union":
            return a.unionAll(b)
        if op == "uniondist":
            return a.union(b).distinct()
        if op == "intersect":
            return a.intersect(b)  # EXCEPT/INTERSECT: DISTINCT semantics
        if op == "intersectall":
            return a.intersectAll(b)
        if op == "exceptall":
            return a.exceptAll(b)
        return a.subtract(b)

    kind, src, where = plan[0], plan[1], plan[2]
    df = _sp_source(src, spark, sf_dir)
    if where is not None:
        df = df.filter(_sp_pred(where))
    if kind == "proj":
        return df.select(*[
            (_sp_int(e) if _is_int_expr(e) else _sp_str(e)).alias(f"c{i}")
            for i, e in enumerate(plan[3])
        ])
    if kind == "agg":
        keys, aggs = plan[3], plan[4]
        having = plan[5] if len(plan) > 5 else None
        kcols = [_sp_key(k).alias(f"k{i}") for i, k in enumerate(keys)]
        acols = [_sp_agg(a).alias(f"a{i}") for i, a in enumerate(aggs)]
        out = df.groupBy(*kcols).agg(*acols) if kcols else df.agg(*acols)
        if having is not None:
            tag, op, idx, lit = having
            a = F.col(f"a{idx}")
            b = F.lit(lit) if tag == "hs" else F.lit(lit).cast("long")
            out = out.filter({
                "<": a < b, "<=": a <= b, "=": a == b,
                "<>": a != b, ">": a > b, ">=": a >= b,
            }[op])
        return out
    # win
    pkey, oexpr, wfs = plan[3], plan[4], plan[5]
    fspec = plan[6] if len(plan) > 6 else None
    okey = _sp_int(oexpr)
    w = Window.partitionBy(_sp_key(pkey)).orderBy(F.asc_nulls_first(okey))
    wf_frame = w
    if fspec is not None:
        hi = fspec[2] if len(fspec) > 2 else 0
        wf_frame = (
            w.rowsBetween(-fspec[1], hi) if fspec[0].startswith("rows")
            else w.rangeBetween(-fspec[1], hi)
        )
    out = [_sp_key(pkey).alias("k0"), okey.alias("o0")]
    for i, wf in enumerate(wfs):
        if wf[0] == "rank":
            c = F.rank().over(w).cast("long")
        elif wf[0] == "dense_rank":
            c = F.dense_rank().over(w).cast("long")
        elif wf[0] in ("fsum", "fmin", "fcount"):
            fn = {"fsum": F.sum, "fmin": F.min, "fcount": F.count}[wf[0]]
            c = fn(okey).over(wf_frame)
        elif wf[0] in ("rsum", "rmin", "rcount"):
            # v21: RANGE frames aggregate an ARBITRARY expression
            # (value-based bounds include all peers — permutation-safe)
            fn = {"rsum": F.sum, "rmin": F.min, "rcount": F.count}[wf[0]]
            c = fn(_sp_int(wf[1])).over(wf_frame)
        elif wf[0] in ("wlag", "wlead"):
            # v12: offset functions take the ORDER EXPRESSION (tie-safe)
            fn = F.lag if wf[0] == "wlag" else F.lead
            c = fn(okey, wf[1], wf[2]).over(w).cast("long")
        elif wf[0] in ("wpct", "wcume"):
            fn = F.percent_rank if wf[0] == "wpct" else F.cume_dist
            c = fn().over(w)
        elif wf[0] == "wnth":
            # v17: nth_value of the ORDER EXPRESSION, full frame
            c = F.nth_value(okey, wf[1]).over(
                w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
            ).cast("long")
        else:
            fn = {"wsum": F.sum, "wmin": F.min, "wcount": F.count}[wf[0]]
            c = fn(_sp_int(wf[1])).over(w)
        out.append(c.alias(f"w{i}"))
    return df.select(*out)


# ---------------------------------------------------------------------------
# DuckDB compiler (must mirror the Spark compile EXACTLY, incl. fold shape)
# ---------------------------------------------------------------------------

def _sql_slit(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


def _dk_int(e) -> str:
    op = e[0]
    if op == "icol":
        return f"CAST({e[1]} AS BIGINT)"
    if op == "ilit":
        return f"CAST({e[1]} AS BIGINT)"
    if op == "add":
        return f"({_dk_int(e[1])} + {_dk_int(e[2])})"
    if op == "sub":
        return f"({_dk_int(e[1])} - {_dk_int(e[2])})"
    if op == "mul":
        return f"(({_dk_int(e[1])} % {_MUL_MOD}) * ({_dk_int(e[2])} % {_MUL_MOD}))"
    if op == "abs":
        return f"abs({_dk_int(e[1])})"
    if op == "case":
        return f"(CASE WHEN {_dk_pred(e[1])} THEN {_dk_int(e[2])} ELSE {_dk_int(e[3])} END)"
    if op == "nullif":
        a = _dk_int(e[1])
        return f"(CASE WHEN {a} = {e[2]} THEN NULL ELSE {a} END)"
    if op == "len":
        return f"CAST(length({_dk_str(e[1])}) AS BIGINT)"
    if op == "epochus":
        return f"(epoch_us({e[1]}) % 1000000000)"
    if op == "datepart":
        return f"CAST({e[1]}({e[2]}) AS BIGINT)"
    if op == "jint":
        return f"CAST(json_extract_string({e[1]}, '$.{e[2]}') AS BIGINT)"
    if op == "strpos":
        return f"CAST(strpos({_dk_str(e[1])}, {_sql_slit(e[2])}) AS BIGINT)"
    if op in ("great", "least"):
        fn = "greatest" if op == "great" else "least"
        return f"{fn}({_dk_int(e[1])}, {_dk_int(e[2])})"
    if op in ("band", "bor", "bxor"):
        if op == "bxor":
            return f"xor({_dk_int(e[1])}, {_dk_int(e[2])})"
        sym = "&" if op == "band" else "|"
        return f"({_dk_int(e[1])} {sym} {_dk_int(e[2])})"
    if op in ("shl", "shr"):
        if op == "shl":  # abs(): DuckDB << raises on negative LHS
            return f"CAST((abs({_dk_int(e[1])} % {_MUL_MOD}) << {e[2]}) AS BIGINT)"
        return f"CAST((({_dk_int(e[1])} % {_MUL_MOD}) >> {e[2]}) AS BIGINT)"
    if op == "cube3":
        return f"CAST(pow({_dk_int(e[1])} % 97, 3) AS BIGINT)"
    if op == "lev":
        return (
            f"CAST(levenshtein(left({_dk_str(e[1])}, 48),"
            f" left({_dk_str(e[2])}, 48)) AS BIGINT)"
        )
    if op == "bcount":
        return f"CAST(bit_count({_dk_int(e[1])}) AS BIGINT)"
    if op == "isign":
        return f"CAST(sign({_dk_int(e[1])}) AS BIGINT)"
    if op == "dfloor":
        return f"CAST(floor({e[1]} / {e[2]}) AS BIGINT)"
    if op == "dceil":
        return f"CAST(ceil({e[1]} * {e[2]}) AS BIGINT)"
    if op == "ascii":
        return f"CAST(ascii({_dk_str(e[1])}) AS BIGINT)"
    if op == "trycast":
        # FINDING #8 (first v20 soak, via TRY_CAST(to_hex(...))): Spark
        # try_cast to BIGINT accepts ONLY trimmed [+-]?digits, while
        # DuckDB TRY_CAST also parses exponent ('1E5' -> 100000),
        # decimal ('12.0' -> 12, '.5' -> 1 ROUNDED) and 0x-hex forms —
        # all reachable once hex digests/ihex (or digit substrings of
        # timestamp renders concatenated with an 'e' from column text)
        # enter the string space.  The guarded twin NULLs every
        # non-integral lexical form, matching Spark exactly (probed:
        # whitespace trim incl tab, +/- sign, leading zeros, overflow
        # -> NULL on both).  Pinned in
        # test_try_cast_nonintegral_lexical_forms_divergence.
        inner = _dk_str(e[1])
        return (
            f"(CASE WHEN regexp_full_match(trim({inner}, ' \t\n\r'),"
            f" '[+-]?[0-9]+')"
            f" THEN TRY_CAST({inner} AS BIGINT) ELSE NULL END)"
        )
    if op == "ddiff":
        return (
            f"CAST(datediff('day', CAST({e[1]} AS DATE), DATE '{e[2]}') AS BIGINT)"
        )
    if op == "idiv":
        # // truncates toward zero in DuckDB = Spark's `div` (probed)
        return f"({_dk_int(e[1])} // CAST({e[2]} AS BIGINT))"
    if op == "imod":
        return f"({_dk_int(e[1])} % CAST({e[2]} AS BIGINT))"
    if op in ("idivc", "imodc"):
        sym = "//" if op == "idivc" else "%"
        return f"({_dk_int(e[1])} {sym} nullif({_dk_int(e[2])}, 0))"
    if op == "alen":
        return (
            f"CAST(len(regexp_split_to_array({_dk_str(e[1])},"
            f" {_sql_slit(e[2])})) AS BIGINT)"
        )
    raise ValueError(op)


def _dk_str(e) -> str:
    op = e[0]
    if op == "scol":
        return e[1]
    if op == "slit":
        return _sql_slit(e[1])
    if op == "upper":
        return f"upper({_dk_str(e[1])})"
    if op == "lower":
        return f"lower({_dk_str(e[1])})"
    if op == "substr":
        return f"substring({_dk_str(e[1])}, {e[2]}, {e[3]})"
    if op == "concat":
        # ||, not concat(): DuckDB concat() treats NULL as '', Spark propagates
        return f"({_dk_str(e[1])} || {_dk_str(e[2])})"
    if op == "tsfmt":
        return f"strftime({e[1]}, '%Y-%m-%d %H:%M:%S')"
    if op == "tsshift":
        # ({n}) * INTERVAL 1 DAY: DuckDB's parser rejects a bare negative
        # interval literal (INTERVAL -3 DAY), the multiplication form is
        # sign-safe
        return (
            f"strftime({e[1]} + ({e[2]}) * INTERVAL 1 DAY,"
            f" '%Y-%m-%d %H:%M:%S')"
        )
    if op == "trim":
        return f"trim({_dk_str(e[1])})"
    if op == "replace":
        return f"replace({_dk_str(e[1])}, {_sql_slit(e[2])}, {_sql_slit(e[3])})"
    if op in ("lpad", "rpad"):
        # NON-EMPTY pad only: lpad(s, n, '') raises in DuckDB where
        # Spark returns the input unchanged (v11 exclusion class)
        return f"{op}({_dk_str(e[1])}, {e[2]}, {_sql_slit(e[3])})"
    if op == "srepeat":
        return f"repeat({_dk_str(e[1])}, {e[2]})"
    if op == "xlate":
        return f"translate({_dk_str(e[1])}, {_sql_slit(e[2])}, {_sql_slit(e[3])})"
    if op == "rext":
        return f"regexp_extract({_dk_str(e[1])}, {_sql_slit(e[2])}, 1)"
    if op == "srev":
        return f"reverse({_dk_str(e[1])})"
    if op in ("sleft", "sright"):
        fn = "left" if op == "sleft" else "right"
        return f"{fn}({_dk_str(e[1])}, {e[2]})"
    if op == "cws":
        return f"concat_ws('|', {_dk_str(e[1])}, {_dk_str(e[2])})"
    if op == "lastday":
        return f"strftime(last_day({e[1]}), '%Y-%m-%d')"
    if op == "tsshiftcal":
        return (
            f"strftime({e[1]} + ({e[2]}) * INTERVAL 1 {e[3].upper()},"
            f" '%Y-%m-%d %H:%M:%S')"
        )
    if op == "spart":
        return f"split_part({_dk_str(e[1])}, {_sql_slit(e[2])}, {e[3]})"
    if op == "selem":
        # 1-based element access, NULL out-of-range (the twin of F.get)
        return f"(regexp_split_to_array({_dk_str(e[1])}, {_sql_slit(e[2])})[{e[3] + 1}])"
    if op == "md5h":
        # DuckDB md5 takes VARCHAR and hashes its UTF-8 bytes — the
        # twin of Spark's md5(encode(s, 'UTF-8'))
        return f"md5({_dk_str(e[1])})"
    if op == "sha256h":
        return f"sha256({_dk_str(e[1])})"
    if op == "ihex":
        return f"to_hex({_dk_int(e[1])})"
    if op == "schr":
        return f"chr(CAST(32 + abs({_dk_int(e[1])}) % 95 AS INTEGER))"
    if op == "jstr":
        return f"json_extract_string({e[1]}, '$.{e[2]}')"
    if op == "scase":
        return (
            f"(CASE WHEN {_dk_pred(e[1])} THEN {_dk_str(e[2])}"
            f" ELSE {_dk_str(e[3])} END)"
        )
    if op == "scoal":
        return f"coalesce({_dk_str(e[1])}, {_sql_slit(e[2])})"
    if op == "btr":
        return f"trim({_dk_str(e[1])}, {_sql_slit(e[2])})"
    if op in ("ltr", "rtr"):
        fn = "ltrim" if op == "ltr" else "rtrim"
        return f"{fn}({_dk_str(e[1])}, {_sql_slit(e[2])})"
    if op == "sregrep":
        # 'g' flag: DuckDB replaces only the FIRST match by default
        # where Spark replaces all (pinned divergence)
        return (
            f"regexp_replace({_dk_str(e[1])}, {_sql_slit(e[2])},"
            f" {_sql_slit(e[3])}, 'g')"
        )
    if op == "aset":
        # v21: list twins under list_distinct + list_sort; the CASE
        # guard mirrors Spark's NULL propagation — DuckDB list_concat
        # treats a NULL operand as EMPTY and list_filter over a NULL
        # probe list drops every element (both probed)
        s1 = f"left({_dk_str(e[2])}, 120)"
        s2 = f"left({_dk_str(e[3])}, 120)"
        a1 = f"regexp_split_to_array({s1}, ' ')"
        a2 = f"regexp_split_to_array({s2}, ' ')"
        inner = {
            "union": f"list_concat({a1}, {a2})",
            "inter": f"list_intersect({a1}, {a2})",
            "exc": f"list_filter({a1}, x -> NOT list_contains({a2}, x))",
        }[e[1]]
        # coalesce: DuckDB array_to_string([]) is NULL where Spark
        # array_join([]) is '' (the strjoin/ljoin empty-group rule)
        return (
            f"(CASE WHEN ({s1}) IS NULL OR ({s2}) IS NULL THEN NULL"
            f" ELSE coalesce("
            f"array_to_string(list_sort(list_distinct({inner})), ','), '')"
            f" END)"
        )
    raise ValueError(op)


def _dk_pred(p) -> str:
    op = p[0]
    if op in ("icmp", "scmp"):
        side = _dk_int if op == "icmp" else _dk_str
        return f"({side(p[2])} {p[1]} {side(p[3])})"
    if op == "isnull":
        return f"({_dk_int(p[1])} IS NULL)"
    if op == "acontains":
        return (
            f"list_contains(regexp_split_to_array({_dk_str(p[1])}, ' '), "
            f"{_sql_slit(p[2])})"
        )
    if op == "like":
        return f"({_dk_str(p[1])} LIKE {_sql_slit(p[3].format(p[2]))})"
    if op == "inlist":
        vals = ", ".join(f"CAST({v} AS BIGINT)" for v in p[2])
        return f"({_dk_int(p[1])} IN ({vals}))"
    if op == "sinlist":
        svals = ", ".join(_sql_slit(v) for v in p[2])
        return f"({_dk_str(p[1])} IN ({svals}))"
    if op == "and":
        return f"({_dk_pred(p[1])} AND {_dk_pred(p[2])})"
    if op == "or":
        return f"({_dk_pred(p[1])} OR {_dk_pred(p[2])})"
    if op == "not":
        return f"(NOT {_dk_pred(p[1])})"
    raise ValueError(op)


def _dk_key(k) -> str:
    if k[0] == "kmod":
        return f"(CAST({k[1]} AS BIGINT) % {int(k[2])})"
    if k[0] == "ktrunc":
        return f"strftime(date_trunc('{k[2]}', {k[1]}), '%Y-%m-%d %H:%M:%S')"
    if k[0] == "kstr":
        return _dk_str(k[1])
    return _dk_int(k) if k[0] == "icol" else _dk_str(k)


def _dk_agg(a) -> str:
    op = a[0]
    if op == "count_star":
        return "count(*)"
    if op in ("fcnt", "fsumi", "fmaxi"):
        fn = {"fcnt": "count", "fsumi": "sum", "fmaxi": "max"}[op]
        expr = f"{fn}({_dk_int(a[1])}) FILTER (WHERE {_dk_pred(a[2])})"
        if op == "fsumi":
            expr = f"CAST({expr} AS BIGINT)"  # HUGEINT widen, as plain sum
        return expr
    if op == "strjoin":
        # fuzzer finding #4 (v8 first soak): DuckDB's ORDERED aggregate
        # string_agg(x, sep ORDER BY x) loses the order in ROLLUP/CUBE
        # super-aggregate rows — the coarser grouping sets merge the
        # finer sets' sorted partial states WITHOUT a re-sort (repro:
        # lineitem grand-total row unsorted at 6000 elements, even
        # single-threaded; plain GROUP BY and small inputs stay sorted).
        # Portable twin = sort AFTER aggregation, exactly Spark's
        # array_join(sort_array(collect_list)):
        return (
            f"coalesce(array_to_string(list_sort("
            f"list({a[1]}) FILTER (WHERE {a[1]} IS NOT NULL)), '|'), '')"
        )
    if op in ("ball", "bany"):
        fn = "bool_and" if op == "ball" else "bool_or"
        return f"{fn}({_dk_pred(a[1])})"
    if op in ("abit_and", "abit_or", "abit_xor"):
        fn = op[1:]  # identical names on both engines
        return f"CAST({fn}({_dk_int(a[1])}) AS BIGINT)"
    if op in ("mins", "maxs"):
        return f"{'min' if op == 'mins' else 'max'}({_dk_str(a[1])})"
    if op == "countd_s":
        return f"count(DISTINCT {_dk_str(a[1])})"
    if op == "countd2":
        # v21: row form — the struct twin of Spark countDistinct(struct)
        return f"count(DISTINCT ({_dk_int(a[1])}, {_dk_int(a[2])}))"
    if op == "sjoind":
        # v22: list(DISTINCT) keeps a NULL element; array_to_string
        # skips it; coalesce closes the all-NULL/empty group to ''
        return (
            f"coalesce(array_to_string(list_sort("
            f"list(DISTINCT {_dk_str(a[1])})), '|'), '')"
        )
    if op in ("amax", "amin"):
        # v22: arg_max/arg_min skip NULL values natively; the NULLed-key
        # guard on the Spark side makes the semantics line up
        fn = "arg_max" if op == "amax" else "arg_min"
        return f"CAST({fn}({_dk_int(a[1])}, {a[2]}) AS BIGINT)"
    if op in ("amaxf", "aminf"):
        # v25.1: affine-of-key value (FINDING #10 — non-unique uk)
        fn = "arg_max" if op == "amaxf" else "arg_min"
        return (
            f"CAST({fn}(CAST({a[3]} AS BIGINT) * {a[1]} + {a[2]}, "
            f"{a[3]}) AS BIGINT)"
        )
    if op == "anyf":
        # v23: functionally-dependent any_value (see the Spark twin)
        return (
            f"CAST(any_value(({_dk_key(a[1])} * {a[2]}) + {a[3]}) AS BIGINT)"
        )
    if op == "medi":
        return f"CAST(median({_dk_int(a[1])}) AS DOUBLE)"
    if op == "quanti":
        return f"CAST(quantile_cont({_dk_int(a[1])}, {a[2]!r}) AS DOUBLE)"
    if op == "ljoin":
        # NULL-skip FILTER (Spark collect_list skips NULLs), sort AFTER
        # aggregation (finding #4), coalesce for the empty/all-NULL
        # group (Spark: empty array -> '')
        e = _dk_int(a[1])
        return (
            f"coalesce(array_to_string(list_sort("
            f"list({e}) FILTER (WHERE ({e}) IS NOT NULL))[1:{a[2]}], ','), '')"
        )
    if op in ("minsqrt", "maxsqrt"):
        return f"{'min' if op == 'minsqrt' else 'max'}(sqrt({a[1]}))"
    if op == "mindmod":
        # FINDING #6 (first v14 soak): DuckDB's fmod() FUNCTION is the
        # rounded a - trunc(a/b)*b (each op rounded), while its %
        # OPERATOR — like Spark's % and C fmod — is the exact IEEE
        # remainder: fmod(20.0, 0.03) = 0.019999999999999574 but
        # 20.0 % 0.03 = 0.02000000000000074.  Compile the % operator.
        # Pinned in test_duckdb_fmod_function_vs_operator_divergence.
        return f"min(({a[1]} % CAST({a[2]!r} AS DOUBLE)))"
    if op in ("mind", "maxd"):
        return f"{'min' if op == 'mind' else 'max'}({a[1]})"
    if op == "sumd4":
        return f"CAST(SUM(CAST({a[1]} AS DECIMAL(18,4))) AS DOUBLE)"
    if op == "avgd4":
        return (
            f"(CAST(SUM(CAST({a[1]} AS DECIMAL(18,4))) AS DOUBLE)"
            f" / count({a[1]}))"
        )
    if op == "sumd4prod":
        # CAST .. AS DECIMAL(38,4) first — see the Spark twin's comment
        return (
            f"CAST(CAST(SUM(CAST({a[1]} AS DECIMAL(18,4))"
            f" * (CAST(1 AS DECIMAL(18,4)) - CAST({a[2]} AS DECIMAL(18,4))))"
            f" AS DECIMAL(38,4)) AS DOUBLE)"
        )
    e = _dk_int(a[1])
    if op == "sum":
        return f"CAST(sum({e}) AS BIGINT)"  # HUGEINT -> driver dtype hazard
    if op == "countd":
        return f"count(DISTINCT {e})"
    return f"{op}({e})"


def _dk_source(src) -> tuple[str, str | None]:
    """FROM clause + an extra WHERE conjunct (for EXISTS forms)."""
    kind = src[0]
    if kind == "ev":
        return "events", None
    if kind == "doc":
        return "documents", None
    if kind == "li":
        return "lineitem", None
    if kind == "ij":
        return "lineitem JOIN orders ON l_orderkey = o_orderkey", None
    if kind == "lj":
        return "lineitem LEFT JOIN orders ON l_orderkey = o_orderkey", None
    if kind == "ijc":
        return ("lineitem JOIN orders ON l_orderkey = o_orderkey "
                "JOIN customer ON o_custkey = c_custkey"), None
    if kind == "ljc":
        return ("lineitem LEFT JOIN orders ON l_orderkey = o_orderkey "
                "LEFT JOIN customer ON o_custkey = c_custkey"), None
    exists = "EXISTS (SELECT 1 FROM orders WHERE o_orderkey = l_orderkey)"
    return "lineitem", exists if kind == "semi" else f"NOT {exists}"


_SETOP_SQL = {
    "union": "UNION ALL", "uniondist": "UNION",
    "intersect": "INTERSECT", "except": "EXCEPT",
    "intersectall": "INTERSECT ALL", "exceptall": "EXCEPT ALL",
}


_CSUB_INNER = {
    "cnt": "CAST(count(*) AS BIGINT)",
    "maxi": "max(CAST(o_custkey AS BIGINT))",
    "mini": "min(CAST(o_custkey AS BIGINT))",
    "sumi": "CAST(sum(o_custkey) AS BIGINT)",  # HUGEINT hazard: cast back
    "maxd": "max(o_totalprice)",
    "mind": "min(o_totalprice)",
}


def compile_sql(plan) -> str:
    if plan[0] == "insub":
        # v24: [NOT] IN (SELECT ...) — same text both engines
        _, neg, inner_mod, nullc, where = plan
        iw = ""
        if inner_mod is not None:
            m, r = inner_mod
            iw = f" WHERE (CAST(o_custkey AS BIGINT) % {m}) = {r}"
        inner_e = ("o_orderkey" if nullc is None
                   else f"nullif(o_orderkey, {nullc})")
        kw = "NOT IN" if neg else "IN"
        wparts = [f"l_orderkey {kw} (SELECT {inner_e} FROM orders{iw})"]
        if where is not None:
            wparts.append(_dk_pred(where))
        return (
            "SELECT CAST(l_orderkey AS BIGINT) AS c0, "
            "CAST(l_linenumber AS BIGINT) AS c1 "
            f"FROM lineitem WHERE {' AND '.join(wparts)}"
        )

    if plan[0] == "gsub":
        # v25: correlated scalar subquery as a grouping expression —
        # GROUP BY ordinals (1, 3) list the subquery itself (the bare
        # grouped-select-list form errors on BOTH engines; probed)
        _, m, inner, inner_mod, where = plan
        conj = (
            f"(CAST(o_orderkey AS BIGINT) % {m}) = "
            f"(CAST(l_orderkey AS BIGINT) % {m})"
        )
        if inner_mod is not None:
            m2, r = inner_mod
            conj += f" AND (CAST(o_custkey AS BIGINT) % {m2}) = {r}"
        sub = f"(SELECT {_CSUB_INNER[inner]} FROM orders WHERE {conj})"
        w = f" WHERE {_dk_pred(where)}" if where is not None else ""
        return (
            f"SELECT (CAST(l_orderkey AS BIGINT) % {m}) AS g, "
            "CAST(count(*) AS BIGINT) AS c0, "
            f"{sub} AS s0 FROM lineitem{w} GROUP BY 1, 3"
        )

    if plan[0] == "latlim":
        # v26: correlated LATERAL + ORDER BY/LIMIT — the projected c2
        # is the order column, so the emitted multiset is deterministic
        _, k, inner_mod, where = plan
        conj = "o.o_orderkey = l.l_orderkey"
        if inner_mod is not None:
            m, r = inner_mod
            conj += f" AND (CAST(o.o_custkey AS BIGINT) % {m}) = {r}"
        w = f" WHERE {_dk_pred(where)}" if where is not None else ""
        return (
            "SELECT CAST(l.l_orderkey AS BIGINT) AS c0, "
            "CAST(l.l_linenumber AS BIGINT) AS c1, t.c2 "
            "FROM lineitem l, LATERAL ("
            "SELECT CAST(o.o_custkey AS BIGINT) AS c2 FROM orders o "
            f"WHERE {conj} "
            f"ORDER BY o.o_custkey ASC NULLS FIRST LIMIT {k}) t{w}"
        )

    if plan[0] == "exneq":
        # v25: [NOT] EXISTS with a correlated BETWEEN — non-equi
        # existence join, one SQL text on both engines
        _, neg, d1, d2, inner_mod, where = plan
        conj = (
            f"CAST(o_orderkey AS BIGINT) BETWEEN "
            f"CAST(l_orderkey AS BIGINT) - {d1} AND "
            f"CAST(l_orderkey AS BIGINT) + {d2}"
        )
        if inner_mod is not None:
            m, r = inner_mod
            conj += f" AND (CAST(o_custkey AS BIGINT) % {m}) = {r}"
        ex = f"EXISTS (SELECT 1 FROM orders WHERE {conj})"
        if neg:
            ex = f"NOT {ex}"
        wparts = [ex]
        if where is not None:
            wparts.append(_dk_pred(where))
        return (
            "SELECT CAST(l_orderkey AS BIGINT) AS c0, "
            "CAST(l_linenumber AS BIGINT) AS c1 "
            f"FROM lineitem WHERE {' AND '.join(wparts)}"
        )

    if plan[0] == "aggwin":
        # v25: window over the aggregate relation (see the Spark twin);
        # direction + tiebreak null orders pinned per v9
        _, src, where, key, agg, wfn, direction = plan
        frm, extra = _dk_source(src)
        conj = [c for c in (extra, _dk_pred(where) if where is not None else None) if c]
        w = f" WHERE {' AND '.join(conj)}" if conj else ""
        op = agg[0]
        if op == "cnt":
            aggsql = "CAST(count(*) AS BIGINT)"
        elif op == "sumi":
            aggsql = f"CAST(sum(CAST({agg[1]} AS BIGINT)) AS BIGINT)"
        elif op == "maxi":
            aggsql = f"max(CAST({agg[1]} AS BIGINT))"
        else:
            aggsql = f"min(CAST({agg[1]} AS BIGINT))"
        d = "ASC NULLS FIRST" if direction == "asc" else "DESC NULLS LAST"
        over = f"ORDER BY v {d}, g ASC NULLS FIRST"
        if wfn == "rnsum":
            wcol = (
                f"CAST(sum(v) OVER ({over} ROWS BETWEEN UNBOUNDED "
                f"PRECEDING AND CURRENT ROW) AS BIGINT)"
            )
        else:
            wcol = f"CAST({wfn}() OVER ({over}) AS BIGINT)"
        return (
            f"SELECT g, v, {wcol} AS r FROM "
            f"(SELECT {_dk_key(key)} AS g, {aggsql} AS v "
            f"FROM {frm}{w} GROUP BY {_dk_key(key)}) t"
        )

    if plan[0] == "topk":
        # v23: deterministic top-n via the unique-key tiebreak;
        # direction defaults pinned per v9 (ASC NULLS FIRST / DESC
        # NULLS LAST)
        _, src, where, expr, n, direction, uk = plan
        frm, extra = _dk_source(src)
        conj = [c for c in (extra, _dk_pred(where) if where is not None else None) if c]
        w = f" WHERE {' AND '.join(conj)}" if conj else ""
        d = "ASC NULLS FIRST" if direction == "asc" else "DESC NULLS LAST"
        # tiebreak pins NULLS FIRST to match the Spark side's F.asc
        # (Spark default) — uk is non-null today, but a nullable uk
        # must not diverge silently (ADVICE r11)
        return (
            f"SELECT {_dk_int(expr)} AS c0, {uk} AS c1 FROM {frm}{w}"
            f" ORDER BY c0 {d}, c1 ASC NULLS FIRST LIMIT {n}"
        )

    if plan[0] == "aggall":
        # v23: GROUP BY ALL — one text, both engines (portable subset)
        _, keys, iaggs, where = plan
        kparts = [f"{_dk_key(k)} AS k{i}" for i, k in enumerate(keys)]
        aparts = []
        for j, a in enumerate(iaggs):
            if a == "cnt":
                aparts.append(f"CAST(count(*) AS BIGINT) AS a{j}")
            else:
                fn, col = a.split(":")
                expr = f"{fn}({col})"
                if fn == "sum":
                    expr = f"CAST({expr} AS BIGINT)"
                aparts.append(f"{expr} AS a{j}")
        w = f" WHERE {_dk_pred(where)}" if where is not None else ""
        return (
            f"SELECT {', '.join(kparts + aparts)} FROM lineitem{w}"
            f" GROUP BY ALL"
        )

    if plan[0] == "csub":
        _, inner, inner_mod, where = plan[:4]
        thr = plan[4] if len(plan) > 4 else None
        conj = "o_orderkey = l_orderkey"
        if inner_mod is not None:
            m, r = inner_mod
            conj += f" AND (CAST(o_custkey AS BIGINT) % {m}) = {r}"
        sub = f"(SELECT {_CSUB_INNER[inner[0]]} FROM orders WHERE {conj})"
        wparts = []
        if where is not None:
            wparts.append(_dk_pred(where))
        if thr is not None:
            # v7: uncorrelated integer scalar-subquery threshold
            op, agg = thr
            wparts.append(
                f"(CAST(l_orderkey AS BIGINT) {op} "
                f"(SELECT {_CSUB_INNER[agg]} FROM orders))"
            )
        w = f" WHERE {' AND '.join(wparts)}" if wparts else ""
        return (
            "SELECT CAST(l_orderkey AS BIGINT) AS c0, "
            "CAST(l_linenumber AS BIGINT) AS c1, "
            f"{sub} AS s0 FROM lineitem{w}"
        )

    if plan[0] == "casex":
        _, neg, inner_mod, where = plan
        conj = "o_orderkey = l_orderkey"
        if inner_mod is not None:
            m, r = inner_mod
            conj += f" AND (CAST(o_custkey AS BIGINT) % {m}) = {r}"
        ex = f"EXISTS (SELECT 1 FROM orders WHERE {conj})"
        if neg:
            ex = f"NOT {ex}"
        w = f" WHERE {_dk_pred(where)}" if where is not None else ""
        return (
            "SELECT CAST(l_orderkey AS BIGINT) AS c0, "
            "CAST(l_linenumber AS BIGINT) AS c1, "
            f"(CASE WHEN {ex} THEN 1 ELSE 0 END) AS c2 FROM lineitem{w}"
        )

    if plan[0] == "lat":
        _, inner_mod, where = plan
        conj = "o.o_orderkey = l.l_orderkey"
        if inner_mod is not None:
            m, r = inner_mod
            conj += f" AND (CAST(o.o_custkey AS BIGINT) % {m}) = {r}"
        w = f" WHERE {_dk_pred(where)}" if where is not None else ""
        return (
            "SELECT CAST(l.l_orderkey AS BIGINT) AS c0, "
            "CAST(l.l_linenumber AS BIGINT) AS c1, t.c2, t.c3 "
            "FROM lineitem l, LATERAL ("
            "SELECT CAST(count(*) AS BIGINT) AS c2, "
            "min(CAST(o.o_custkey AS BIGINT)) AS c3 "
            f"FROM orders o WHERE {conj}) t{w}"
        )

    if plan[0] == "csub2":
        _, inner, op, iagg, delta, where = plan
        thr = (
            f"(SELECT {iagg}(CAST(o2.o_custkey AS BIGINT)) + {delta} "
            "FROM orders o2)"
        )
        sub = (
            f"(SELECT {_CSUB_INNER[inner]} FROM orders "
            f"WHERE o_orderkey = l_orderkey "
            f"AND CAST(o_custkey AS BIGINT) {op} {thr})"
        )
        w = f" WHERE {_dk_pred(where)}" if where is not None else ""
        return (
            "SELECT CAST(l_orderkey AS BIGINT) AS c0, "
            "CAST(l_linenumber AS BIGINT) AS c1, "
            f"{sub} AS s0 FROM lineitem{w}"
        )

    if plan[0] == "winnamed":
        # v11: named WINDOW clauses, one dialect-portable SQL text.  w1
        # is unframed (rank/dense_rank ignore frames; the default RANGE
        # frame never applies to them), w2 carries the explicit ROWS
        # frame; framed aggregates take the ORDER EXPRESSION itself
        # (the v7 tie-safety rule — fixtures carry duplicate rows).
        _, pkey, ocol, delta, k, wfs, where = plan
        pk = _dk_key(pkey)
        oe = f"(CAST({ocol} AS BIGINT) + {delta})"
        parts = [f"{pk} AS k0", f"{oe} AS o0"]
        for i, wf in enumerate(wfs):
            if wf[0] in ("rank", "dense_rank"):
                parts.append(f"CAST({wf[0]}() OVER w1 AS BIGINT) AS w{i}")
            else:
                fn = {"nwsum": "sum", "nwmin": "min", "nwcount": "count"}[wf[0]]
                expr = f"{fn}({oe}) OVER w2"
                if wf[0] in ("nwsum", "nwcount"):
                    expr = f"CAST({expr} AS BIGINT)"
                parts.append(f"{expr} AS w{i}")
        w = f" WHERE {_dk_pred(where)}" if where is not None else ""
        return (
            f"SELECT {', '.join(parts)} FROM lineitem{w} "
            f"WINDOW w1 AS (PARTITION BY {pk} ORDER BY {oe} ASC NULLS FIRST), "
            f"w2 AS (PARTITION BY {pk} ORDER BY {oe} ASC NULLS FIRST "
            f"ROWS BETWEEN {k} PRECEDING AND CURRENT ROW)"
        )

    if plan[0] == "pivot":
        _, src, where, key, (pcol, pvals), agg = plan
        frm, extra = _dk_source(src)
        conj = [c for c in (extra, _dk_pred(where) if where is not None else None) if c]
        w = f" WHERE {' AND '.join(conj)}" if conj else ""
        fn = agg[0]
        m = _dk_int(agg[1])
        cells = []
        for i, v in enumerate(pvals):
            cell = f"{fn}(CASE WHEN {pcol} = {_sql_slit(v)} THEN {m} END)"
            if fn == "count":
                # fuzzer finding #5 (v11-era reseed of the in-suite run):
                # Spark's DataFrame pivot pre-aggregates by (key, pcol)
                # and emits NULL for a (key, value) cell with NO ROWS,
                # while the flat CASE-form count over the key group
                # returns 0.  sum/min/max agree (empty -> NULL on both
                # paths); only count distinguishes "absent cell" from
                # "cell whose rows all have a NULL measure" (count 0 on
                # BOTH engines for the latter).  Portable twin: NULL out
                # the count exactly when the cell has no rows at all.
                # Pinned in test_spark_pivot_empty_cell_count_divergence.
                exists = f"count(CASE WHEN {pcol} = {_sql_slit(v)} THEN 1 END)"
                cell = f"(CASE WHEN {exists} = 0 THEN NULL ELSE {cell} END)"
            # count/sum widen (HUGEINT hazard) — cast back on both sides
            cells.append(f"CAST({cell} AS BIGINT) AS p{i}")
        return (
            f"SELECT {_dk_key(key)} AS k0, {', '.join(cells)} "
            f"FROM {frm}{w} GROUP BY {_dk_key(key)}"
        )

    if plan[0] == "unpivot":
        _, src, where, key, cols = plan
        frm, extra = _dk_source(src)
        conj = [c for c in (extra, _dk_pred(where) if where is not None else None) if c]
        w = f" WHERE {' AND '.join(conj)}" if conj else ""
        base = (
            f"SELECT {_dk_key(key)} AS k0, "
            + ", ".join(f"CAST({c} AS BIGINT) AS {c}" for c in cols)
            + f" FROM {frm}{w}"
        )
        arms = [
            f"SELECT k0, {_sql_slit(c)} AS var, {c} AS val FROM b"
            for c in cols
        ]
        return f"WITH b AS ({base}) " + " UNION ALL ".join(arms)

    if plan[0] == "winq":
        _, src, where, pkey, oexpr, k = plan[:6]
        direction = plan[6] if len(plan) > 6 else "asc"
        frm, extra = _dk_source(src)
        conj = [c for c in (extra, _dk_pred(where) if where is not None else None) if c]
        w = f" WHERE {' AND '.join(conj)}" if conj else ""
        # both defaults are asymmetric: ASC -> Spark NULLS FIRST vs
        # DuckDB NULLS LAST; DESC -> Spark NULLS LAST vs DuckDB NULLS
        # FIRST — pin explicitly in BOTH directions
        odir = "ASC NULLS FIRST" if direction == "asc" else "DESC NULLS LAST"
        over = (
            f"PARTITION BY {_dk_key(pkey)} "
            f"ORDER BY {_dk_int(oexpr)} {odir}"
        )
        inner = (
            f"SELECT {_dk_key(pkey)} AS k0, {_dk_int(oexpr)} AS o0, "
            f"CAST(rank() OVER ({over}) AS BIGINT) AS w0 FROM {frm}{w}"
        )
        return f"SELECT * FROM ({inner}) q WHERE w0 <= {k}"

    if plan[0] == "aggroll":
        _, mode, src, where, keys, aggs = plan
        frm, extra = _dk_source(src)
        conj = [c for c in (extra, _dk_pred(where) if where is not None else None) if c]
        w = f" WHERE {' AND '.join(conj)}" if conj else ""
        # PRE-PROJECT keys into named columns, mirroring the Spark side's
        # select-then-rollup (v20, the finding-#7 artifact fix): grouping
        # on the raw expression TEXT collapses keys that compile
        # identically (ROLLUP(x, x) -> sets {(),(x),(x,x)} with the
        # duplicate bound BY EXPRESSION), while Spark's pre-projected
        # k0/k1 stay distinct positions.  With both engines grouping on
        # the projected columns the shapes agree even for duplicated
        # expressions.
        proj = ", ".join(
            ["*"] + [f"{_dk_key(k)} AS k{i}" for i, k in enumerate(keys)]
        )
        inner = f"(SELECT {proj} FROM {frm}{w}) _rollsrc"
        kparts = [f"k{i}" for i in range(len(keys))]
        aparts = [f"{_dk_agg(a)} AS a{i}" for i, a in enumerate(aggs)] + [
            # v7: GROUPING() flags discriminate super-aggregate rows
            f"CAST(GROUPING(k{i}) AS BIGINT) AS g{i}"
            for i in range(len(keys))
        ]
        sel = ", ".join(kparts + aparts)
        if isinstance(mode, tuple):  # v11 explicit GROUPING SETS
            _, subsets = mode
            sets_sql = ", ".join(
                "(" + ", ".join(f"k{i}" for i in ss) + ")"
                for ss in subsets
            )
            grp = f" GROUP BY GROUPING SETS ({sets_sql})"
        else:
            fn = "ROLLUP" if mode == "rollup" else "CUBE"
            grp = f" GROUP BY {fn}({', '.join(kparts)})"
        # fuzzer finding #3 (v6 first soak): over an EMPTY input Spark's
        # rollup/cube emits ZERO rows while DuckDB emits the ANSI
        # grand-total row (count 0).  Real groups always carry count >= 1,
        # so HAVING count(*) > 0 is the exact portable twin of Spark's
        # semantics (no-op on non-empty inputs).  Pinned in
        # tests/test_parity_fuzz.py::test_spark_rollup_empty_input_divergence.
        return f"SELECT {sel} FROM {inner}{grp} HAVING count(*) > 0"

    if plan[0] == "setop":
        _, op, src, wa, wb, projs = plan
        frm, extra = _dk_source(src)
        parts = [
            f"{_dk_int(e) if _is_int_expr(e) else _dk_str(e)} AS c{i}"
            for i, e in enumerate(projs)
        ]

        def side(w, reverse=False):
            conj = [c for c in (extra, _dk_pred(w) if w is not None else None) if c]
            ww = f" WHERE {' AND '.join(conj)}" if conj else ""
            sel = ", ".join(parts[::-1] if reverse else parts)
            return f"SELECT {sel} FROM {frm}{ww}"

        if op == "ubyname":
            # v21: side B reversed, resolved by the BY NAME modifier
            return f"({side(wa)}) UNION ALL BY NAME ({side(wb, reverse=True)})"
        return f"({side(wa)}) {_SETOP_SQL[op]} ({side(wb)})"

    kind, src, where = plan[0], plan[1], plan[2]
    frm, extra = _dk_source(src)
    conj = [c for c in (extra, _dk_pred(where) if where is not None else None) if c]
    w = f" WHERE {' AND '.join(conj)}" if conj else ""
    if kind == "proj":
        sel = ", ".join(
            f"{_dk_int(e) if _is_int_expr(e) else _dk_str(e)} AS c{i}"
            for i, e in enumerate(plan[3])
        )
        return f"SELECT {sel} FROM {frm}{w}"
    if kind == "agg":
        keys, aggs = plan[3], plan[4]
        having = plan[5] if len(plan) > 5 else None
        kparts = [f"{_dk_key(k)} AS k{i}" for i, k in enumerate(keys)]
        aparts = [f"{_dk_agg(a)} AS a{i}" for i, a in enumerate(aggs)]
        sel = ", ".join(kparts + aparts)
        grp = f" GROUP BY {', '.join(_dk_key(k) for k in keys)}" if keys else ""
        hv = ""
        if having is not None:
            tag, op, idx, lit = having
            cmp_lit = _sql_slit(lit) if tag == "hs" else f"CAST({lit} AS BIGINT)"
            hv = f" HAVING {_dk_agg(aggs[idx])} {op} {cmp_lit}"
        return f"SELECT {sel} FROM {frm}{w}{grp}{hv}"
    # win — Spark's default ordered-window frame is RANGE to CURRENT ROW;
    # emit it explicitly, and pin NULLS FIRST (DuckDB ASC default is LAST)
    pkey, oexpr, wfs = plan[3], plan[4], plan[5]
    fspec = plan[6] if len(plan) > 6 else None
    over = f"PARTITION BY {_dk_key(pkey)} ORDER BY {_dk_int(oexpr)} ASC NULLS FIRST"
    frame = "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW"
    if fspec is not None:
        kw = "ROWS" if fspec[0].startswith("rows") else "RANGE"
        hi = (f"{fspec[2]} FOLLOWING" if len(fspec) > 2 else "CURRENT ROW")
        frame = f"{kw} BETWEEN {fspec[1]} PRECEDING AND {hi}"
    parts = [f"{_dk_key(pkey)} AS k0", f"{_dk_int(oexpr)} AS o0"]
    for i, wf in enumerate(wfs):
        if wf[0] in ("rank", "dense_rank"):
            parts.append(f"CAST({wf[0]}() OVER ({over}) AS BIGINT) AS w{i}")
        elif wf[0] in ("fsum", "fmin", "fcount"):
            # v7 ROWS frame: aggregate the ORDER EXPRESSION (tie-safe)
            fn = {"fsum": "sum", "fmin": "min", "fcount": "count"}[wf[0]]
            expr = f"{fn}({_dk_int(oexpr)}) OVER ({over} {frame})"
            if wf[0] == "fsum":
                expr = f"CAST({expr} AS BIGINT)"
            parts.append(f"{expr} AS w{i}")
        elif wf[0] in ("rsum", "rmin", "rcount"):
            # v21 RANGE frame: arbitrary expression (peers included)
            fn = {"rsum": "sum", "rmin": "min", "rcount": "count"}[wf[0]]
            expr = f"{fn}({_dk_int(wf[1])}) OVER ({over} {frame})"
            if wf[0] == "rsum":
                expr = f"CAST({expr} AS BIGINT)"
            parts.append(f"{expr} AS w{i}")
        elif wf[0] in ("wlag", "wlead"):
            # v12: offset functions over the ORDER EXPRESSION (tie-safe)
            fn = "lag" if wf[0] == "wlag" else "lead"
            expr = (
                f"CAST({fn}({_dk_int(oexpr)}, {wf[1]}, "
                f"CAST({wf[2]} AS BIGINT)) OVER ({over}) AS BIGINT)"
            )
            parts.append(f"{expr} AS w{i}")
        elif wf[0] in ("wpct", "wcume"):
            # v13: rank-based distribution functions (tie-stable doubles)
            fn = "percent_rank" if wf[0] == "wpct" else "cume_dist"
            parts.append(f"{fn}() OVER ({over}) AS w{i}")
        elif wf[0] == "wnth":
            # v17: nth_value of the ORDER EXPRESSION, full frame
            expr = (
                f"CAST(nth_value({_dk_int(oexpr)}, {wf[1]}) OVER ({over} "
                f"ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)"
                f" AS BIGINT)"
            )
            parts.append(f"{expr} AS w{i}")
        else:
            fn = {"wsum": "sum", "wmin": "min", "wcount": "count"}[wf[0]]
            expr = f"{fn}({_dk_int(wf[1])}) OVER ({over} {frame})"
            if wf[0] == "wsum":
                expr = f"CAST({expr} AS BIGINT)"
            parts.append(f"{expr} AS w{i}")
    return f"SELECT {', '.join(parts)} FROM {frm}{w}"


_INT_OPS = {"icol", "ilit", "add", "sub", "mul", "abs", "case", "nullif", "len", "epochus", "jint", "strpos", "datepart", "great", "least", "trycast", "ddiff", "band", "bor", "bxor", "shl", "shr", "cube3", "lev", "ascii", "bcount", "isign", "dfloor", "dceil", "idiv", "imod", "idivc", "imodc", "alen"}


def _is_int_expr(e) -> bool:
    return e[0] in _INT_OPS


# ---------------------------------------------------------------------------
# driver-semantics compare
# ---------------------------------------------------------------------------

_NULL_STR = "\x00<NULL>"


def _normalize(pdf):
    import pandas as pd

    out = {}
    for c in sorted(pdf.columns):
        col = pdf[c]
        if col.dtype == object and any(isinstance(v, str) for v in col.dropna().head(50)):
            out[c] = col.map(lambda v: _NULL_STR if v is None or v != v else str(v))
        else:
            # ints, HUGEINT-objects, doubles, NULLs -> float64 (same mapping
            # both sides; small values so float64 is exact for the int range)
            out[c] = col.astype("float64")
    df = pd.DataFrame(out)
    cols = list(df.columns)
    return df.sort_values(cols, na_position="first").reset_index(drop=True), cols


def compare(sdf_pandas, duck_pandas) -> str | None:
    """None if results match under driver semantics, else a description."""
    a, acols = _normalize(sdf_pandas)
    b, bcols = _normalize(duck_pandas)
    if acols != bcols:
        return f"column mismatch: spark={acols} duck={bcols}"
    if len(a) != len(b):
        return f"row count mismatch: spark={len(a)} duck={len(b)}"
    for c in acols:
        av, bv = a[c].to_numpy(), b[c].to_numpy()
        if a[c].dtype == object:
            if not (av == bv).all():
                i = int((av != bv).argmax())
                return f"col {c} row {i}: spark={av[i]!r} duck={bv[i]!r}"
        else:
            neq = ~((av == bv) | (_isnan(av) & _isnan(bv)))
            if neq.any():
                i = int(neq.argmax())
                return f"col {c} row {i}: spark={av[i]!r} duck={bv[i]!r}"
    return None


def _isnan(arr):
    import numpy as np

    with np.errstate(invalid="ignore"):
        return arr != arr


def register_views(con, sf_dir: str) -> None:
    for t in ("lineitem", "orders", "customer", "events", "documents"):
        con.execute(
            f"CREATE OR REPLACE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )


def check_plan(plan, spark, con, sf_dir: str) -> str | None:
    sdf = compile_spark(plan, spark, sf_dir).toPandas()
    ddf = con.execute(compile_sql(plan)).df()
    return compare(sdf, ddf)


# ---------------------------------------------------------------------------
# soak entrypoint
# ---------------------------------------------------------------------------

def main() -> int:
    import argparse
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    ap = argparse.ArgumentParser()
    ap.add_argument("--examples", type=int, default=200)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--seed", type=int, default=None)
    args = ap.parse_args()

    import duckdb
    from hypothesis import HealthCheck, Phase, given, seed, settings

    from pulsar_ingestion_spark.session import get_spark

    spark = get_spark("parityfuzz")
    con = duckdb.connect()
    register_views(con, args.sf_dir)

    ran = [0]

    @settings(
        max_examples=args.examples,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
        phases=[Phase.generate, Phase.shrink],
    )
    @given(plan=plans())
    def run(plan):
        ran[0] += 1
        if ran[0] % 25 == 0:
            print(f"  ... {ran[0]} plans checked", flush=True)
        diff = check_plan(plan, spark, con, args.sf_dir)
        assert diff is None, f"PARITY DIVERGENCE: {diff}\nplan={plan!r}\nsql={compile_sql(plan)}"

    if args.seed is not None:
        run = seed(args.seed)(run)

    try:
        run()
    except AssertionError as exc:
        print(exc)
        return 1
    finally:
        spark.stop()
    print(f"OK: {ran[0]} random plans matched Spark <-> DuckDB exactly")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
