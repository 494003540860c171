package graft.blocks

/** Deterministic block-document fixtures, derived from the golden
  * `StreamerMessage` example embedded in the reference
  * (borealis-indexer/src/main.rs:118-349): height 63596, gas_burnt
  * 424555062500, tokens_burnt 424555062500000000000, total_supply
  * 2050206401403887985811862247311434 (34 digits — exercises
  * Decimal(38,0)), timestamp 1618558205803345000 ns.
  *
  * `blockJson(h)` re-keys the example to height h (hashes suffixed so
  * they stay unique per block, prev_hash chains to h-1, timestamps
  * advance 1s per height — NEAR's ~1 block/s cadence). `withChunk=false`
  * produces the `shard.chunk: None` case (main.rs:538-546) that S18
  * null-branch handling must survive.
  */
object Fixtures {
  val baseHeight = 63596L
  val baseTsNanos = 1618558205803345000L

  private def actionsJson: String =
    """[{"action_type":"CreateAccount"},
       |{"action_type":"Transfer","deposit":"40000000000000000000000000"},
       |{"action_type":"AddKey","public_key":"ed25519:2syGhqwJ8ba2nUGmP9tkZn9m1DYZPYYobpufiERVnug8",
       |"access_key":{"nonce":0,"permission":"FullAccess"}}]""".stripMargin.replace("\n", "")

  private def chunkHeaderJson(h: Long, heightIncluded: Long): String =
    s"""{"chunk_hash":"2M2oeNFBbUUnHfkU1UuBr8EKBCLMH9xr2vfsGRpyiBmA-$h",
       |"prev_block_hash":"2vJNJca72pBiq2eETq2xvuoc6caKDaUkdRgtdefyutbA-${h - 1}",
       |"outcome_root":"11111111111111111111111111111111",
       |"prev_state_root":"3gZPPijaumgMRCvMuuZZM1Ab2LoHTSfYigMKwLqZ67m6",
       |"encoded_merkle_root":"79Bt7ivt9Qhp3c6dJYnueaTyPVweYxZRpQHASRRAiyuy",
       |"encoded_length":8,"height_created":$h,"height_included":$heightIncluded,
       |"shard_id":0,"gas_used":0,"gas_limit":1000000000000000,
       |"rent_paid":"0","validator_reward":"0","balance_burnt":"0",
       |"outgoing_receipts_root":"H4Rd6SGeEBTbxkitsCdzfu9xL9HtZ2eHoPCQXUeZ6bW4",
       |"tx_root":"11111111111111111111111111111111","validator_proposals":[],
       |"signature":"ed25519:2vWNayBzEoW5DRc7gTdhxdLbkKuK6ACQ78p3JGpKSAZZCarnLroeoALPAFwpr9ZNPxBqdVYh9QLBe7WHZebsS17Z"}""".stripMargin
      .replace("\n", "")

  private def outcomeJson(h: Long, id: String, executor: String, statusJson: String, receiptJson: String): String =
    s"""{"execution_outcome":{"proof":[],
       |"block_hash":"G9v6Fsv94xaa7BRY2N5PFF5PJwT7ec6DPzQK73Yf3CZ6-$h",
       |"id":"$id",
       |"outcome":{"logs":[],"receipt_ids":["CbWu7WYYbYbn3kThs5gcxANrxy7AKLcMcBLxLw8Zq1Fz-$h"],
       |"gas_burnt":424555062500,"tokens_burnt":"424555062500000000000",
       |"executor_id":"$executor","status":$statusJson}},
       |"receipt":$receiptJson}""".stripMargin.replace("\n", "")

  private def receiptJson(h: Long): String =
    s"""{"predecessor_id":"test.near","receiver_id":"some.test.near",
       |"receipt_id":"CbWu7WYYbYbn3kThs5gcxANrxy7AKLcMcBLxLw8Zq1Fz-$h",
       |"receipt":{"signer_id":"test.near",
       |"signer_public_key":"ed25519:8NA7mh6TAWzy2qz68bHp62QHTEQ6nJLfiYeKDRwEbU3X",
       |"gas_price":"1030000000","output_data_receivers":[],"input_data_ids":[],
       |"actions":$actionsJson}}""".stripMargin.replace("\n", "")

  def blockJson(h: Long, withChunk: Boolean = true): String = {
    val tsNanos = baseTsNanos + (h - baseHeight) * 1000000000L
    val txJson =
      s"""{"transaction":{"signer_id":"test.near",
         |"public_key":"ed25519:8NA7mh6TAWzy2qz68bHp62QHTEQ6nJLfiYeKDRwEbU3X",
         |"nonce":${h - baseHeight + 1},"receiver_id":"some.test.near",
         |"actions":$actionsJson,
         |"signature":"ed25519:Qniuu7exnr6xbe6gKafV5vDhuwM1jt9Bn7sCTF6cHfPpYWVJ4Q6kq8RAxKSeLoxbCreVp1XzMMJmXt8YcUqmMYw",
         |"hash":"8dNv9S8rAFwso9fLwfDQXmw5yv5zscDjQpta96pMF6Bi-$h"},
         |"outcome":${outcomeJson(h, s"8dNv9S8rAFwso9fLwfDQXmw5yv5zscDjQpta96pMF6Bi-$h", "test.near",
            s"""{"status_type":"SuccessReceiptId","value":"CbWu7WYYbYbn3kThs5gcxANrxy7AKLcMcBLxLw8Zq1Fz-$h"}""",
            "null")}}""".stripMargin.replace("\n", "")
    val chunkJson =
      if (withChunk)
        s"""{"author":"test.near","header":${chunkHeaderJson(h, 0L)},
           |"transactions":[$txJson],"receipts":[${receiptJson(h)}]}""".stripMargin.replace("\n", "")
      else "null"
    s"""{"block":{"author":"test.near","header":{"height":$h,
       |"epoch_id":"Bk7pvZWUTfHRRZtfgTDjnQ6y5cV8yG2h3orCqJvUbiym",
       |"next_epoch_id":"3JuBZ4Gz5Eauf7PzQegfqSEDyvws3eKJYPbfGHAYmeR5",
       |"hash":"5X37niQWWcihDGQjsvDMHYKLCurNJyQLxCeLgneDb8mk-$h",
       |"prev_hash":"5X37niQWWcihDGQjsvDMHYKLCurNJyQLxCeLgneDb8mk-${h - 1}",
       |"prev_state_root":"GkdxSBf4Kfq8V16N4Kqn3YdcThG1f5KG1KLBmXpMzP1k",
       |"chunk_receipts_root":"9ETNjrt6MkwTgSVMMbpukfxRshSD1avBUUa4R4NuqwHv",
       |"chunk_headers_root":"C7dVr9KdXYKt31yF2BkeAu115fpo79zYTqeU3FzqbFak",
       |"chunk_tx_root":"7tkzFg8RHBmMw1ncRJZCCZAizgq4rwCftTKYLce8RU8t",
       |"outcome_root":"7tkzFg8RHBmMw1ncRJZCCZAizgq4rwCftTKYLce8RU8t",
       |"chunks_included":1,
       |"challenges_root":"11111111111111111111111111111111",
       |"timestamp":$tsNanos,"timestamp_nanosec":$tsNanos,
       |"random_value":"3cAa93XmoLaKAJQgWz3K7SiKwnA3uaxi8MGgLM78HTNS",
       |"validator_proposals":[],"chunk_mask":[true],
       |"gas_price":"1000000000","rent_paid":"0","validator_reward":"0",
       |"total_supply":"2050206401403887985811862247311434",
       |"challenges_result":[],
       |"last_final_block":"DCkMmXYHqibzcMjgFjRXJP7eckAMLrA4ijggSApMNwKu",
       |"last_ds_final_block":"2vJNJca72pBiq2eETq2xvuoc6caKDaUkdRgtdefyutbA",
       |"next_bp_hash":"4DJWnxRbUhRrsXK6EBkx4nFeXHKgJWqteDnJ7Hv4MZ6M",
       |"block_merkle_root":"Bvn5K89fJ3uPNsj3324Ls9TXAGUVteHPpfKwKqL1La6W",
       |"approvals":["ed25519:F816hgJod7nPfD2qQz5yhaKDMn1JXmvzj2iXegsJpsmPNnYYZpKYJXgyuVTVJ4TKQbcJ2Q3USCGZF6fX2TcwBBv",null],
       |"signature":"ed25519:239NbE4BuJaxneQA3AEsPrsGY7v3wBgaezbgg56HER69zPrBoc3a4fbyVWPXeoKE3LvgGma1g6pSHk9QHkmETCZY",
       |"latest_protocol_version":43},
       |"chunks":[${chunkHeaderJson(h, h)}]},
       |"shards":[{"shard_id":0,"chunk":$chunkJson,
       |"receipt_execution_outcomes":[${outcomeJson(h, s"CbWu7WYYbYbn3kThs5gcxANrxy7AKLcMcBLxLw8Zq1Fz-$h",
          "some.test.near", s"""{"status_type":"SuccessValue","value":""}""", receiptJson(h))}],
       |"state_changes":[{"cause":{"cause_type":"ValidatorAccountsUpdate"},
       |"value":{"value_type":"AccountUpdate","account_id":"test.near",
       |"account":{"amount":"1000000000000000000000000000000000",
       |"locked":"50000000000000000000000000000000",
       |"code_hash":"11111111111111111111111111111111",
       |"storage_usage":182,"storage_paid_at":0}}}]}]}""".stripMargin.replace("\n", "")
  }

  /** n consecutive blocks starting at `from`; every 5th block has a
    * chunk-less shard (the None branch)
    */
  def blocksJson(from: Long, n: Int): Seq[String] =
    (0 until n).map(i => blockJson(from + i, withChunk = (from + i) % 5 != 0))
}
