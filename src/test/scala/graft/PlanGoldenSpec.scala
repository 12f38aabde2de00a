package graft

/** Plan-shape golden tests for the headline queries: join strategy,
  * build side, and scan-level filter pushdown pinned as assertions, so a
  * silent strategy flip (stats drift, AQE threshold change, an
  * accidental cast that blocks pushdown) fails CI instead of shipping a
  * 100×-slower plan that still returns correct rows.
  *
  * Assertions run on the pre-execution physical plan (the same surface
  * the scattered per-suite checks already use); attribute ids vary per
  * session, so patterns regex over them.
  */
class PlanGoldenSpec extends SparkSpec {

  private def planOf(name: String): String =
    SparkEntry.queries(name)(spark, sfDir)
      .queryExecution.executedPlan.toString

  private def count(p: String, token: String): Int =
    token.r.findAllMatchIn(p).size

  private def assertHas(p: String, pattern: String, what: String): Unit =
    assert(pattern.r.findFirstIn(p).isDefined,
      s"$what missing; plan:\n${p.take(4000)}")

  test("star_revenue_by_nation: pure broadcast star, no shuffle joins") {
    val p = planOf("star_revenue_by_nation")
    assert(count(p, "BroadcastHashJoin") == 4, s"expected 4 BHJ:\n$p")
    assert(count(p, "BuildRight") == 4, "every dim must build broadcast side")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"))
  }

  test("q1: single scan, no join, shipdate pushed to the scan") {
    val p = planOf("q1_pricing_summary")
    assert(!p.contains("Join"), "q1 must not join")
    assertHas(p, """l_shipdate#\d+ <= 1998-09-02""", "shipdate pushdown")
  }

  test("q3: TakeOrderedAndProject top-10 over two broadcast joins, " +
    "segment filter pushed into the customer scan") {
    val p = planOf("q3_shipping_priority")
    assertHas(p, """TakeOrderedAndProject\(limit=10""", "top-k operator")
    assert(count(p, "BroadcastHashJoin") == 2)
    assertHas(p, """c_mktsegment#\d+ = BUILDING""", "segment pushdown")
  }

  test("q5: five broadcast joins, region name pushed into region scan") {
    val p = planOf("q5_local_supplier_revenue")
    assert(count(p, "BroadcastHashJoin") == 5, s"expected 5 BHJ:\n$p")
    assert(!p.contains("SortMergeJoin"))
    assertHas(p, """r_name#\d+ = ASIA""", "region pushdown")
  }

  test("q13: LeftOuter broadcast join, preserved customer scan unfiltered") {
    val p = planOf("q13_customer_distribution")
    assertHas(p, """BroadcastHashJoin .*LeftOuter, BuildRight""",
      "left-outer broadcast")
    // the join-condition filter must NOT leak onto the preserved side
    assertHas(p,
      """FileScan parquet \[c_custkey#\d+L?\][^\n]*DataFilters: \[\]""",
      "unfiltered customer scan")
  }

  test("q18: TakeOrderedAndProject top-100 over broadcast joins") {
    val p = planOf("q18_large_volume_customer")
    assertHas(p, """TakeOrderedAndProject\(limit=100""", "top-k operator")
    assert(count(p, "BroadcastHashJoin") == 2)
    assert(count(p, "BuildRight") == 2)
  }

  test("q19: broadcast join keeps the disjunctive residue; side-local " +
    "OR terms push into both scans") {
    val p = planOf("q19_discounted_revenue")
    assertHas(p, """BroadcastHashJoin .*BuildRight, \(+\(+\(+\(+\(*p_brand""",
      "OR-of-ANDs residue on the join")
    assertHas(p, """DataFilters: [^\n]*l_quantity#\d+ >= 1\.0\) AND""",
      "quantity band pushdown on lineitem")
    assertHas(p, """DataFilters: [^\n]*p_size#\d+ >= 1\)""",
      "size pushdown on part")
  }

  test("q21: one semi AND one anti broadcast join in a single plan, " +
    "status + region filters pushed") {
    val p = planOf("q21_waiting_suppliers")
    assertHas(p, """BroadcastHashJoin .*LeftSemi""", "semi rewrite")
    assertHas(p, """BroadcastHashJoin .*LeftAnti""", "anti rewrite")
    assertHas(p, """o_orderstatus#\d+ = F""", "order status pushdown")
    assertHas(p, """n_regionkey#\d+ <= 2""", "region pushdown")
  }

  test("q22: 1-row scalar broadcast cross join + anti join on recent " +
    "orders, date pushed") {
    val p = planOf("q22_idle_customers")
    assertHas(p, """BroadcastNestedLoopJoin BuildRight, Cross""",
      "scalar broadcast")
    assertHas(p, """BroadcastHashJoin .*LeftAnti, BuildRight""",
      "anti join on orders")
    assertHas(p, """o_orderdate#\d+ >= 1999-01-01""", "date pushdown")
  }

  test("q2: decorrelated min joins back via sort-merge on (price, part); " +
    "supplier filter pushed on both occurrences") {
    val p = planOf("q2_min_cost_supplier")
    assert(p.contains("SortMergeJoin"), "min-equality join must be SMJ")
    assert(count(p, "BroadcastHashJoin") >= 3)
    assert(count(p, """s_nationkey#\d+ < 13""") >= 2,
      "supplier pushdown on both outer and inner occurrence")
  }

  test("q4: semi join against lineitem with the 90-day condition as " +
    "join residue, order dates pushed") {
    val p = planOf("q4_order_priority")
    assertHas(p, """Join LeftSemi|BroadcastHashJoin .*LeftSemi|SortMergeJoin .*LeftSemi""",
      "semi join")
    assertHas(p, """o_orderdate#\d+ >= 1997-01-01""", "date pushdown")
    assert(!p.contains("Distinct"), "semi join must dedup for free")
  }

  test("q7: both dim lookups broadcast; only the direction test " +
    "survives as a post-join filter") {
    val p = planOf("q7_nation_volume")
    assert(count(p, "BroadcastHashJoin") >= 2, s"dims must broadcast:\n$p")
    assert(!p.contains("SortMergeJoin") || count(p, "SortMergeJoin") == 1,
      "at most the fact-fact join may shuffle")
    assertHas(p, """l_shipdate#\d+ >= 1996-01-01""", "shipdate pushdown")
  }

  test("q8: single aggregation pass (partial+final), customers semi-" +
    "joined, no second scan for the denominator") {
    val p = planOf("q8_market_share")
    assert(count(p, "HashAggregate") == 2,
      s"numerator+denominator must share one aggregation:\n$p")
    assertHas(p, """LeftSemi""", "customer region semi join")
  }

  test("q10: top-20 via TakeOrderedAndProject, returnflag and date " +
    "pushed into their scans") {
    val p = planOf("q10_returned_items")
    assertHas(p, """TakeOrderedAndProject\(limit=20""", "top-k operator")
    assertHas(p, """l_returnflag#\d+ = R""", "returnflag pushdown")
    assertHas(p, """o_orderdate#\d+ >= 1996-01-01""", "date pushdown")
  }

  test("q15: the max-equality filter over the 1-row scalar broadcast " +
    "collapses into a HASH join keyed on the normalized double — " +
    "better than a nested-loop filter, and pinned so it stays that way") {
    val p = planOf("q15_top_supplier")
    assertHas(p,
      """BroadcastHashJoin \[knownfloatingpointnormalized[^\n]*Cross, BuildRight""",
      "hash-keyed scalar broadcast")
    assert(!p.contains("BroadcastNestedLoopJoin"), "no BNLJ expected")
    assertHas(p, """l_shipdate#\d+ >= 1996-01-01""", "shipdate pushdown")
  }

  test("q16: anti join for NOT IN, countDistinct as two-phase " +
    "aggregate, part filters pushed") {
    val p = planOf("q16_part_supplier_counts")
    assertHas(p, """BroadcastHashJoin .*LeftAnti""", "NOT IN anti join")
    assertHas(p, """p_size#\d+ IN \(1,5,10,15,20,25\)""", "size pushdown")
  }

  test("q17: decorrelated per-part avg joins back on partkey; brand " +
    "filter pushed into the part scan") {
    val p = planOf("q17_small_qty_revenue")
    assertHas(p, """p_brand#\d+ = Brand#23""", "brand pushdown")
    // join back on l_partkey: either SMJ or SHJ is fine, but it must be
    // keyed on partkey, not a nested loop
    assert(!p.contains("NestedLoop"), s"no nested loop allowed:\n$p")
  }

  test("q20: two stacked semi joins over the reduced aggregate, name " +
    "prefix pushed into the part scan") {
    val p = planOf("q20_excess_suppliers")
    assert(count(p, "LeftSemi") == 2, s"expected 2 semi joins:\n$p")
    assertHas(p, """StartsWith\(p_name#\d+, small\)""", "name pushdown")
  }

  test("sortmerge_status_revenue: fact-fact join stays sort-merge") {
    val p = planOf("sortmerge_status_revenue")
    assertHas(p, """SortMergeJoin .*Inner""", "SMJ")
    assert(!p.contains("BroadcastHashJoin"))
  }

  test("brand_revenue: part dim broadcasts, lineitem never shuffles") {
    val p = planOf("brand_revenue")
    assertHas(p, """BroadcastHashJoin .*Inner, BuildRight""", "BHJ")
    assert(!p.contains("SortMergeJoin") && !p.contains("ShuffledHashJoin"))
  }

  test("hint_shuffle_hash_revenue: the hint yields a shuffled hash join " +
    "building the smaller orders side") {
    val p = planOf("hint_shuffle_hash_revenue")
    assertHas(p, """ShuffledHashJoin .*Inner, BuildRight""", "SHJ")
  }

  test("events_asof_attribution: as-of is window-based - no join node, " +
    "type filter pushed to the scan") {
    val p = planOf("events_asof_attribution")
    assert(!p.contains("Join"), "as-of must not be a join")
    assertHas(p, """event_type#\d+ IN \(click,purchase\)""",
      "type pushdown")
  }

  test("events_value_bands: band dim broadcasts as the nested-loop " +
    "build side with the range predicate") {
    val p = planOf("events_value_bands")
    assertHas(p,
      """BroadcastNestedLoopJoin BuildRight, Inner, \(\(value#\d+ >= lo""",
      "broadcast range join")
  }

  test("events_value_bands_bucketed: bucketed range join becomes an " +
    "equi broadcast join with the range residual") {
    val p = planOf("events_value_bands_bucketed")
    assertHas(p,
      """BroadcastHashJoin \[bucket#\d+L?\], \[bucket#\d+L?\], Inner, BuildRight, \(\(value""",
      "bucket equi-join with range residual")
  }

  test("docs_chunk_overlap: narrow chunking — one generator, no join, " +
    "no aggregation, no shuffle before the output sort") {
    val p = planOf("docs_chunk_overlap")
    assert(!p.contains("Join"), "chunking must not join")
    assert(!p.contains("HashAggregate"), "chunking must not aggregate")
    assertHas(p, "Generate posexplode", "the chunk-start generator")
    // exactly ONE exchange: the rangepartitioning for the final sort —
    // any second one means per-doc state got materialized
    assert(count(p, "Exchange") == 1, s"expected 1 Exchange:\n$p")
  }

  test("snapshot_partition_multi: composite-tuple GROUP BY under a " +
    "second-key filter answers from the manifest — zero data files") {
    val p = planOf("snapshot_partition_multi")
    assertHas(p, "PushedAggregates", "complete aggregate pushdown")
    assert(p.contains("files=0/"),
      s"expected a zero-file metadata answer:\n$p")
  }

  test("snapshot_partition_evolve: GROUP BY the shared key answers " +
    "from the manifest across the spec-evolution boundary") {
    val p = planOf("snapshot_partition_evolve")
    assertHas(p, "PushedAggregates", "complete aggregate pushdown")
    assert(p.contains("files=0/"),
      s"shared-key branch must be a zero-file metadata answer:\n$p")
  }

  test("snapshot_agg_sum_multi: composite-tuple GROUP BY with SUM " +
    "folds per-file sum slots — zero data files on both branches") {
    val p = planOf("snapshot_agg_sum_multi")
    assertHas(p, "PushedAggregates", "complete aggregate pushdown")
    assert(p.contains("files=0/"),
      s"expected zero-file metadata answers:\n$p")
    assert(!p.contains("HashAggregate"),
      s"both branches must answer at plan time:\n$p")
  }

  test("snapshot_pruned_scan: the scan reads a pruned file subset and " +
    "the residual range filter stays on the scan") {
    val p = planOf("snapshot_pruned_scan")
    assert(!p.contains("SortMergeJoin") && !p.contains("Join"),
      "a pruned key-range read must stay join-free")
    assertHas(p, """o_orderkey#\d+L >= 1000""", "residual lower bound")
    assertHas(p, """o_orderkey#\d+L <= 5000""", "residual upper bound")
  }

  test("sketch_price_quantiles: object-hash aggregation for the " +
    "typed-imperative sketch, no join machinery beyond the union") {
    val p = planOf("sketch_price_quantiles")
    assertHas(p, "ObjectHashAggregate",
      "typed-imperative sketches must use object aggregation")
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"),
      "a two-level sketch rollup must not shuffle-join")
  }

  test("events_expectations: the zero-fill join broadcasts the tiny " +
    "constraint-name side; no sort-merge anywhere") {
    val p = planOf("events_expectations")
    assert(!p.contains("SortMergeJoin"),
      "nothing here is big enough to sort-merge")
    assertHas(p, "BroadcastHashJoin|BroadcastNestedLoopJoin",
      "the constraint-name zero-fill must broadcast")
  }

  test("snapshot_zorder_band: a second-dimension band read stays " +
    "join-free with the residual filter on the scan") {
    val p = planOf("snapshot_zorder_band")
    assert(!p.contains("SortMergeJoin") && !p.contains("Join"),
      "a box-pruned band read must stay join-free")
    assertHas(p, """o_custkey#\d+L >= 100""", "residual lower bound")
    assertHas(p, """o_custkey#\d+L <= 250""", "residual upper bound")
  }

  test("docs_dup_span_stats: the shingle df join is SIZE-chosen, " +
    "never hint-forced — the df side grows with the corpus, so a " +
    "mandatory broadcast would be a driver OOM at scale") {
    val q = SparkEntry.queries("docs_dup_span_stats")(spark, sfDir)
    // no forced broadcast anywhere in the logical plan: AQE may (and
    // at fixture scale does) broadcast the measured-small df side,
    // but that choice must come from size, not a hint
    assert(!q.queryExecution.analyzed.toString.contains("ResolvedHint"),
      "no broadcast/join hints allowed on a corpus-sized side")
    val p = q.queryExecution.executedPlan.toString
    assert(!p.contains("CartesianProduct") &&
      !p.contains("BroadcastNestedLoopJoin"),
      s"the shingle join must stay an equi-join:\n${p.take(3000)}")
  }

  test("docs_temperature_mixture: one window over the source key, " +
    "then one aggregation — join-free end to end") {
    val p = planOf("docs_temperature_mixture")
    assert(!p.contains("Join"), "rebalancing must not join")
    assertHas(p, "Window", "per-source count window")
    assertHas(p, "HashAggregate", "final per-source aggregate")
  }

  test("snapshot_zorder3_box: a 3-D box read stays join-free with " +
    "every dimension's residual bounds on the plan") {
    val p = planOf("snapshot_zorder3_box")
    assert(!p.contains("Join"), "a box-pruned read must stay join-free")
    assertHas(p, """o_orderkey#\d+L >= 100""", "dim-1 lower bound")
    assertHas(p, """o_custkey#\d+L >= 10""", "dim-2 lower bound")
    assertHas(p, """o_totalprice#\d+ >= 20000""", "dim-3 lower bound")
  }

  test("dedup_incremental_exact: the prefix-filtered form keeps the " +
    "candidate join EQUI on the prefix token — a regression to the " +
    "(lang, source)-only block re-verifies |new|x|corpus| pairs per " +
    "block (measured 55.8x wall-clock at 10x data before r16)") {
    val p = planOf("dedup_incremental_exact")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"candidate generation degenerated to a pair-enumeration join:\n$p")
    // the candidate join's equi keys must include the prefix token,
    // not just the low-cardinality block keys
    assertHas(p, """ptok#\d+""", "prefix-token join key")
    // the exact verify stays a residual on collisions, never a
    // post-join filter over materialized pairs
    assertHas(p, """graft_jaccard""", "one-pass verify in the plan")
  }

  test("dedup_token_jaccard: the PPJoin self-join form keeps the " +
    "candidate join EQUI on the prefix token (the r17 10x re-proof " +
    "measured the naive blocked all-pairs at 15x wall-clock for 10x " +
    "data) and verifies only bare-id candidate pairs") {
    val p = planOf("dedup_token_jaccard")
    assert(!p.contains("BroadcastNestedLoopJoin") &&
      !p.contains("CartesianProduct"),
      s"candidate generation degenerated to a pair-enumeration join:\n$p")
    assertHas(p, """ptok#\d+""", "prefix-token join key")
    assertHas(p, """graft_jaccard""", "exact verify on candidates")
  }
}
