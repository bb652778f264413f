package graft.etl

/** CONSTRUCTIVE DuckDB oracles for the pipeline query pack (p1-p12).
  *
  * The fixture corpus (graft.fixtures.BlockFixtures) is seed-free: every
  * value is a pure function of the block height. So each extract /
  * correlate surface's expected output is itself a pure function of
  * height, and these oracles RE-DERIVE it in SQL over `range(100, 140)`
  * from the fixture definition plus the reference's documented semantics
  * (/root/reference/src/actions.rs explode+projection rules,
  * src/transactions.rs correlation/fan-out rules) — the SQL never sees
  * Spark's answer. Agreement is a real differential check of traversal
  * order (receipt_index ranks), per-kind projections, status mapping,
  * NEP-297 event parsing + token trimming, account-set extraction, the
  * receipt DAG closure, and byte-exact JSON serialization (p4/p12 build
  * the full nested TransactionView JSON, base64 payloads included, by
  * string construction).
  *
  * MACHINE-GENERATED from the fixture spec (kept in sync by the driver's
  * per-round DuckDB compare and tools/compare.py); edit the generator
  * expressions, not individual literals.
  */
object PipelineOracles {

  val p1: String =
"""WITH heights AS (SELECT range::BIGINT AS h, (1700000000000000000 + range*1000000000)::BIGINT AS ts FROM range(100, 140))
SELECT (h) AS block_height, 'blk'||(h) AS block_hash,
  (1700000000000000000 + (h)*1000000000)::BIGINT AS block_timestamp,
  'tx'||h AS transaction_hash, 'rA'||h AS receipt_id, 0::BIGINT AS receipt_index,
  0::BIGINT AS action_index, 'alice.near' AS signer_id,
  'ed25519:SignerKey' AS signer_public_key, 'alice.near' AS predecessor_id,
  'app.near' AS account_id, 'SUCCESS' AS status, 'FUNCTION_CALL' AS action, '{"kind":"FUNCTION_CALL","method_name":"ft_transfer","args":"'||to_base64(encode('{"receiver_id":"alice.near","amount":"'||(1000+h)||'"}'))||'","gas":30000000000000,"deposit":"1"}' AS action_json,
  '[]' AS input_data_ids, NULL::VARCHAR AS status_success_value,
  'rB'||h AS status_success_receipt, NULL::VARCHAR AS status_failure, NULL::VARCHAR AS contract_hash,
  NULL::VARCHAR AS public_key, NULL::VARCHAR AS access_key_contract_id, '1' AS deposit,
  '100000000' AS gas_price, 30000000000000::DOUBLE AS attached_gas, 2428000000005::BIGINT AS gas_burnt,
  '242800000000000000000' AS tokens_burnt, 'ft_transfer' AS method_name, '{"receiver_id":"alice.near","amount":"'||(1000+h)||'"}' AS args,
  NULL::VARCHAR AS args_account_id, NULL::VARCHAR AS args_new_account_id,
  NULL::VARCHAR AS args_owner_id, 'alice.near' AS args_receiver_id,
  NULL::VARCHAR AS args_sender_id, NULL::VARCHAR AS args_token_id,
  (1000+h)||'' AS args_amount, NULL::VARCHAR AS args_balance,
  NULL::VARCHAR AS args_nft_contract_id, NULL::VARCHAR AS args_nft_token_id,
  NULL::VARCHAR AS return_value_int FROM heights
UNION ALL
SELECT (h+1) AS block_height, 'blk'||(h+1) AS block_hash,
  (1700000000000000000 + (h+1)*1000000000)::BIGINT AS block_timestamp,
  'tx'||h AS transaction_hash, 'rB'||h AS receipt_id, 2::BIGINT AS receipt_index,
  0::BIGINT AS action_index, 'alice.near' AS signer_id,
  'ed25519:SignerKey' AS signer_public_key, 'app.near' AS predecessor_id,
  'bank.near' AS account_id, 'SUCCESS' AS status, 'TRANSFER' AS action, '{"kind":"TRANSFER","deposit":"5000000000000000000000000"}' AS action_json,
  '["did'||h||'"]' AS input_data_ids, '"42"' AS status_success_value,
  NULL::VARCHAR AS status_success_receipt, NULL::VARCHAR AS status_failure, NULL::VARCHAR AS contract_hash,
  NULL::VARCHAR AS public_key, NULL::VARCHAR AS access_key_contract_id, '5000000000000000000000000' AS deposit,
  '100000000' AS gas_price, NULL::DOUBLE AS attached_gas, 2428000000005::BIGINT AS gas_burnt,
  '242800000000000000000' AS tokens_burnt, NULL::VARCHAR AS method_name, NULL::VARCHAR AS args,
  NULL::VARCHAR AS args_account_id, NULL::VARCHAR AS args_new_account_id,
  NULL::VARCHAR AS args_owner_id, NULL::VARCHAR AS args_receiver_id,
  NULL::VARCHAR AS args_sender_id, NULL::VARCHAR AS args_token_id,
  NULL::VARCHAR AS args_amount, NULL::VARCHAR AS args_balance,
  NULL::VARCHAR AS args_nft_contract_id, NULL::VARCHAR AS args_nft_token_id,
  '42' AS return_value_int FROM heights WHERE h < 139
UNION ALL
SELECT (h+1) AS block_height, 'blk'||(h+1) AS block_hash,
  (1700000000000000000 + (h+1)*1000000000)::BIGINT AS block_timestamp,
  'tx'||h AS transaction_hash, 'rB'||h AS receipt_id, 2::BIGINT AS receipt_index,
  1::BIGINT AS action_index, 'alice.near' AS signer_id,
  'ed25519:SignerKey' AS signer_public_key, 'app.near' AS predecessor_id,
  'bank.near' AS account_id, 'SUCCESS' AS status, 'CREATE_ACCOUNT' AS action, '{"kind":"CREATE_ACCOUNT"}' AS action_json,
  '["did'||h||'"]' AS input_data_ids, '"42"' AS status_success_value,
  NULL::VARCHAR AS status_success_receipt, NULL::VARCHAR AS status_failure, NULL::VARCHAR AS contract_hash,
  NULL::VARCHAR AS public_key, NULL::VARCHAR AS access_key_contract_id, NULL::VARCHAR AS deposit,
  '100000000' AS gas_price, NULL::DOUBLE AS attached_gas, 2428000000005::BIGINT AS gas_burnt,
  '242800000000000000000' AS tokens_burnt, NULL::VARCHAR AS method_name, NULL::VARCHAR AS args,
  NULL::VARCHAR AS args_account_id, NULL::VARCHAR AS args_new_account_id,
  NULL::VARCHAR AS args_owner_id, NULL::VARCHAR AS args_receiver_id,
  NULL::VARCHAR AS args_sender_id, NULL::VARCHAR AS args_token_id,
  NULL::VARCHAR AS args_amount, NULL::VARCHAR AS args_balance,
  NULL::VARCHAR AS args_nft_contract_id, NULL::VARCHAR AS args_nft_token_id,
  '42' AS return_value_int FROM heights WHERE h < 139
UNION ALL
SELECT (h) AS block_height, 'blk'||(h) AS block_hash,
  (1700000000000000000 + (h)*1000000000)::BIGINT AS block_timestamp,
  'txc'||h AS transaction_hash, 'rC'||h AS receipt_id, 3::BIGINT AS receipt_index,
  0::BIGINT AS action_index, 'dev.near' AS signer_id,
  'ed25519:SignerKey' AS signer_public_key, 'dev.near' AS predecessor_id,
  'contract.near' AS account_id, 'SUCCESS' AS status, 'DEPLOY_CONTRACT' AS action, '{"kind":"DEPLOY_CONTRACT","code":"AGFzbS1mYWtlLXdhc20tY29kZQ=="}' AS action_json,
  '[]' AS input_data_ids, 'base64://5B' AS status_success_value,
  NULL::VARCHAR AS status_success_receipt, NULL::VARCHAR AS status_failure, '3Ljhu9iBgNdQrooHmngZajQ5W8YgpGK9GuhzNY15WBs3' AS contract_hash,
  NULL::VARCHAR AS public_key, NULL::VARCHAR AS access_key_contract_id, NULL::VARCHAR AS deposit,
  '100000000' AS gas_price, NULL::DOUBLE AS attached_gas, 2428000000005::BIGINT AS gas_burnt,
  '242800000000000000000' AS tokens_burnt, NULL::VARCHAR AS method_name, NULL::VARCHAR AS args,
  NULL::VARCHAR AS args_account_id, NULL::VARCHAR AS args_new_account_id,
  NULL::VARCHAR AS args_owner_id, NULL::VARCHAR AS args_receiver_id,
  NULL::VARCHAR AS args_sender_id, NULL::VARCHAR AS args_token_id,
  NULL::VARCHAR AS args_amount, NULL::VARCHAR AS args_balance,
  NULL::VARCHAR AS args_nft_contract_id, NULL::VARCHAR AS args_nft_token_id,
  NULL::VARCHAR AS return_value_int FROM heights WHERE h%3=0
UNION ALL
SELECT (h) AS block_height, 'blk'||(h) AS block_hash,
  (1700000000000000000 + (h)*1000000000)::BIGINT AS block_timestamp,
  'txc'||h AS transaction_hash, 'rC'||h AS receipt_id, 3::BIGINT AS receipt_index,
  1::BIGINT AS action_index, 'dev.near' AS signer_id,
  'ed25519:SignerKey' AS signer_public_key, 'dev.near' AS predecessor_id,
  'contract.near' AS account_id, 'SUCCESS' AS status, 'ADD_KEY' AS action, '{"kind":"ADD_KEY","public_key":"ed25519:FakeKey111","access_key":{"nonce":0,"permission":{"function_call":{"allowance":"250000000000000000000000","receiver_id":"dex.near","method_names":["swap","deposit"]}}}}' AS action_json,
  '[]' AS input_data_ids, 'base64://5B' AS status_success_value,
  NULL::VARCHAR AS status_success_receipt, NULL::VARCHAR AS status_failure, NULL::VARCHAR AS contract_hash,
  'ed25519:FakeKey111' AS public_key, 'dex.near' AS access_key_contract_id, NULL::VARCHAR AS deposit,
  '100000000' AS gas_price, NULL::DOUBLE AS attached_gas, 2428000000005::BIGINT AS gas_burnt,
  '242800000000000000000' AS tokens_burnt, NULL::VARCHAR AS method_name, NULL::VARCHAR AS args,
  NULL::VARCHAR AS args_account_id, NULL::VARCHAR AS args_new_account_id,
  NULL::VARCHAR AS args_owner_id, NULL::VARCHAR AS args_receiver_id,
  NULL::VARCHAR AS args_sender_id, NULL::VARCHAR AS args_token_id,
  NULL::VARCHAR AS args_amount, NULL::VARCHAR AS args_balance,
  NULL::VARCHAR AS args_nft_contract_id, NULL::VARCHAR AS args_nft_token_id,
  NULL::VARCHAR AS return_value_int FROM heights WHERE h%3=0
UNION ALL
SELECT (h) AS block_height, 'blk'||(h) AS block_hash,
  (1700000000000000000 + (h)*1000000000)::BIGINT AS block_timestamp,
  'txf'||h AS transaction_hash, 'rF'||h AS receipt_id, 4::BIGINT AS receipt_index,
  0::BIGINT AS action_index, 'dev.near' AS signer_id,
  'ed25519:SignerKey' AS signer_public_key, 'dev.near' AS predecessor_id,
  'missing.near' AS account_id, 'FAILURE' AS status, 'DELETE_ACCOUNT' AS action, '{"kind":"DELETE_ACCOUNT","beneficiary_id":"heir.near"}' AS action_json,
  '[]' AS input_data_ids, NULL::VARCHAR AS status_success_value,
  NULL::VARCHAR AS status_success_receipt, '{"ActionError":{"index":0,"kind":"AccountDoesNotExist"}}' AS status_failure, NULL::VARCHAR AS contract_hash,
  NULL::VARCHAR AS public_key, NULL::VARCHAR AS access_key_contract_id, NULL::VARCHAR AS deposit,
  '100000000' AS gas_price, NULL::DOUBLE AS attached_gas, 2428000000005::BIGINT AS gas_burnt,
  '242800000000000000000' AS tokens_burnt, NULL::VARCHAR AS method_name, NULL::VARCHAR AS args,
  NULL::VARCHAR AS args_account_id, NULL::VARCHAR AS args_new_account_id,
  NULL::VARCHAR AS args_owner_id, NULL::VARCHAR AS args_receiver_id,
  NULL::VARCHAR AS args_sender_id, NULL::VARCHAR AS args_token_id,
  NULL::VARCHAR AS args_amount, NULL::VARCHAR AS args_balance,
  NULL::VARCHAR AS args_nft_contract_id, NULL::VARCHAR AS args_nft_token_id,
  NULL::VARCHAR AS return_value_int FROM heights WHERE h%3=0"""

  val p2: String =
"""WITH heights AS (SELECT range::BIGINT AS h, (1700000000000000000 + range*1000000000)::BIGINT AS ts FROM range(100, 140))
SELECT (h) AS block_height, 'blk'||(h) AS block_hash,
  (1700000000000000000 + (h)*1000000000)::BIGINT AS block_timestamp,
  'tx'||h AS transaction_hash, 'rA'||h AS receipt_id, 0::BIGINT AS receipt_index,
  0::BIGINT AS log_index, 'alice.near' AS signer_id,
  'ed25519:SignerKey' AS signer_public_key, 'alice.near' AS predecessor_id,
  'app.near' AS account_id, 'SUCCESS' AS status, 'processing '||h AS log, NULL::VARCHAR AS version,
  NULL::VARCHAR AS standard, NULL::VARCHAR AS event, NULL::VARCHAR AS data_account_id,
  NULL::VARCHAR AS data_owner_id, NULL::VARCHAR AS data_old_owner_id,
  NULL::VARCHAR AS data_new_owner_id, NULL::VARCHAR AS data_liquidation_account_id,
  NULL::VARCHAR AS data_authorized_id, '[]' AS data_token_ids,
  NULL::VARCHAR AS data_token_id, NULL::VARCHAR AS data_position, NULL::VARCHAR AS data_amount FROM heights
UNION ALL
SELECT (h+1) AS block_height, 'blk'||(h+1) AS block_hash,
  (1700000000000000000 + (h+1)*1000000000)::BIGINT AS block_timestamp,
  'tx'||h AS transaction_hash, 'rB'||h AS receipt_id, 2::BIGINT AS receipt_index,
  0::BIGINT AS log_index, 'alice.near' AS signer_id,
  'ed25519:SignerKey' AS signer_public_key, 'app.near' AS predecessor_id,
  'bank.near' AS account_id, 'SUCCESS' AS status, 'plain log line, not an event' AS log, NULL::VARCHAR AS version,
  NULL::VARCHAR AS standard, NULL::VARCHAR AS event, NULL::VARCHAR AS data_account_id,
  NULL::VARCHAR AS data_owner_id, NULL::VARCHAR AS data_old_owner_id,
  NULL::VARCHAR AS data_new_owner_id, NULL::VARCHAR AS data_liquidation_account_id,
  NULL::VARCHAR AS data_authorized_id, '[]' AS data_token_ids,
  NULL::VARCHAR AS data_token_id, NULL::VARCHAR AS data_position, NULL::VARCHAR AS data_amount FROM heights WHERE h < 139
UNION ALL
SELECT (h+1) AS block_height, 'blk'||(h+1) AS block_hash,
  (1700000000000000000 + (h+1)*1000000000)::BIGINT AS block_timestamp,
  'tx'||h AS transaction_hash, 'rB'||h AS receipt_id, 2::BIGINT AS receipt_index,
  1::BIGINT AS log_index, 'alice.near' AS signer_id,
  'ed25519:SignerKey' AS signer_public_key, 'app.near' AS predecessor_id,
  'bank.near' AS account_id, 'SUCCESS' AS status, 'EVENT_JSON:{"version":"1.0.0","standard":"nep171","event":"nft_mint","data":[{"owner_id":"bob.near","token_ids":["tok1","tok2"]}]}' AS log, '1.0.0' AS version,
  'nep171' AS standard, 'nft_mint' AS event, NULL::VARCHAR AS data_account_id,
  'bob.near' AS data_owner_id, NULL::VARCHAR AS data_old_owner_id,
  NULL::VARCHAR AS data_new_owner_id, NULL::VARCHAR AS data_liquidation_account_id,
  NULL::VARCHAR AS data_authorized_id, '["tok1","tok2"]' AS data_token_ids,
  NULL::VARCHAR AS data_token_id, NULL::VARCHAR AS data_position, NULL::VARCHAR AS data_amount FROM heights WHERE h < 139
UNION ALL
SELECT (h+1) AS block_height, 'blk'||(h+1) AS block_hash,
  (1700000000000000000 + (h+1)*1000000000)::BIGINT AS block_timestamp,
  'tx'||h AS transaction_hash, 'rB'||h AS receipt_id, 2::BIGINT AS receipt_index,
  2::BIGINT AS log_index, 'alice.near' AS signer_id,
  'ed25519:SignerKey' AS signer_public_key, 'app.near' AS predecessor_id,
  'bank.near' AS account_id, 'SUCCESS' AS status, 'EVENT_JSON:{"version":"1.0.0","standard":' AS log, NULL::VARCHAR AS version,
  NULL::VARCHAR AS standard, NULL::VARCHAR AS event, NULL::VARCHAR AS data_account_id,
  NULL::VARCHAR AS data_owner_id, NULL::VARCHAR AS data_old_owner_id,
  NULL::VARCHAR AS data_new_owner_id, NULL::VARCHAR AS data_liquidation_account_id,
  NULL::VARCHAR AS data_authorized_id, '[]' AS data_token_ids,
  NULL::VARCHAR AS data_token_id, NULL::VARCHAR AS data_position, NULL::VARCHAR AS data_amount FROM heights WHERE h < 139
UNION ALL
SELECT (h+1) AS block_height, 'blk'||(h+1) AS block_hash,
  (1700000000000000000 + (h+1)*1000000000)::BIGINT AS block_timestamp,
  'tx'||h AS transaction_hash, 'rB'||h AS receipt_id, 2::BIGINT AS receipt_index,
  3::BIGINT AS log_index, 'alice.near' AS signer_id,
  'ed25519:SignerKey' AS signer_public_key, 'app.near' AS predecessor_id,
  'bank.near' AS account_id, 'SUCCESS' AS status, 'EVENT_JSON:{"standard":"nep141","event":"ft_transfer","data":[{"owner_id":"carol.near","amount":"12345","token_ids":["a","b","c","d","e","f","'||repeat('x',70)||'"]}]}' AS log, NULL::VARCHAR AS version,
  'nep141' AS standard, 'ft_transfer' AS event, NULL::VARCHAR AS data_account_id,
  'carol.near' AS data_owner_id, NULL::VARCHAR AS data_old_owner_id,
  NULL::VARCHAR AS data_new_owner_id, NULL::VARCHAR AS data_liquidation_account_id,
  NULL::VARCHAR AS data_authorized_id, '["a","b","c","d"]' AS data_token_ids,
  NULL::VARCHAR AS data_token_id, NULL::VARCHAR AS data_position, '12345' AS data_amount FROM heights WHERE h < 139"""

  val p3: String =
"""WITH heights AS (SELECT range::BIGINT AS h, (1700000000000000000 + range*1000000000)::BIGINT AS ts FROM range(100, 140))
SELECT h AS block_height, 'blk'||h AS block_hash, ts AS block_timestamp,
  'dr'||h AS receipt_id, 1::BIGINT AS receipt_index, 'alice.near' AS predecessor_id,
  'app.near' AS account_id, 'did'||h AS data_id,
  CASE WHEN h%2=1 THEN 'base64://5B' ELSE 'payload'||h END AS data FROM heights"""

  val p4: String =
"""WITH heights AS (SELECT range::BIGINT AS h, (1700000000000000000 + range*1000000000)::BIGINT AS ts FROM range(100, 140))
SELECT 'tx'||h AS transaction_hash, 'alice.near' AS signer_id, h AS tx_block_height,
  'blk'||h AS tx_block_hash, ts AS tx_block_timestamp, '{"transaction":{"hash":"tx'||h||'","signer_id":"alice.near","public_key":"ed25519:AliceKey",'||'"nonce":'||(7+h)||',"receiver_id":"app.near","actions":[{"kind":"FUNCTION_CALL","method_name":"ft_transfer","args":"'||to_base64(encode('{"receiver_id":"alice.near","amount":"'||(1000+h)||'"}'))||'","gas":30000000000000,"deposit":"1"}],"signature":"sig:fake"},"execution_outcome":{"block_hash":"blk'||h||'","block_timestamp":'||ts||',"block_height":'||h||',"id":"tx'||h||'","outcome":{"receipt_ids":["rA'||h||'"],"status":{"success_receipt_id":"rA'||h||'"},"gas_burnt":2428000000005,"tokens_burnt":"242800000000000000000","logs":[],"executor_id":"alice.near"}},"receipts":[{"execution_outcome":{"block_hash":"blk'||h||'","block_timestamp":'||ts||',"block_height":'||h||',"id":"rA'||h||'","outcome":{"receipt_ids":["rB'||h||'"],"status":{"success_receipt_id":"rB'||h||'"},"gas_burnt":2428000000005,"tokens_burnt":"242800000000000000000","logs":["processing '||h||'"],"executor_id":"app.near"}},"receipt":{"predecessor_id":"alice.near","receiver_id":"app.near","receipt_id":"rA'||h||'","action":{"signer_id":"alice.near","signer_public_key":"ed25519:SignerKey","input_data_ids":[],"actions":[{"kind":"FUNCTION_CALL","method_name":"ft_transfer","args":"'||to_base64(encode('{"receiver_id":"alice.near","amount":"'||(1000+h)||'"}'))||'","gas":30000000000000,"deposit":"1"}],"gas_price":"100000000","is_promise_yield":false}}},{"execution_outcome":{"block_hash":"blk'||(h+1)||'","block_timestamp":'||(ts+1000000000)||',"block_height":'||(h+1)||',"id":"rB'||h||'","outcome":{"receipt_ids":[],"status":{"success_value":"IjQyIg=="},"gas_burnt":2428000000005,"tokens_burnt":"242800000000000000000","logs":["plain log line, not an event","EVENT_JSON:{\"version\":\"1.0.0\",\"standard\":\"nep171\",\"event\":\"nft_mint\",\"data\":[{\"owner_id\":\"bob.near\",\"token_ids\":[\"tok1\",\"tok2\"]}]}","EVENT_JSON:{\"version\":\"1.0.0\",\"standard\":","EVENT_JSON:{\"standard\":\"nep141\",\"event\":\"ft_transfer\",\"data\":[{\"owner_id\":\"carol.near\",\"amount\":\"12345\",\"token_ids\":[\"a\",\"b\",\"c\",\"d\",\"e\",\"f\",\"xxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxxx\"]}]}"],"executor_id":"bank.near"}},"receipt":{"predecessor_id":"app.near","receiver_id":"bank.near","receipt_id":"rB'||h||'","action":{"signer_id":"alice.near","signer_public_key":"ed25519:SignerKey","input_data_ids":["did'||h||'"],"actions":[{"kind":"TRANSFER","deposit":"5000000000000000000000000"},{"kind":"CREATE_ACCOUNT"}],"gas_price":"100000000","is_promise_yield":false}}}],"data_receipts":[{"predecessor_id":"alice.near","receiver_id":"app.near","receipt_id":"dr'||h||'","data":{"data_id":"did'||h||'","data":"'||CASE WHEN h%2=1 THEN '//5B' ELSE to_base64(encode('payload'||h)) END||'","is_promise_resume":false}}]}' AS transaction,
  h+1 AS last_block_height
FROM heights WHERE h < 139
UNION ALL
SELECT 'txc'||h, 'dev.near', h, 'blk'||h, ts, '{"transaction":{"hash":"txc'||h||'","signer_id":"dev.near","public_key":"ed25519:DevKey","nonce":1,"receiver_id":"contract.near","actions":[{"kind":"DEPLOY_CONTRACT","code":"AGFzbS1mYWtlLXdhc20tY29kZQ=="},{"kind":"ADD_KEY","public_key":"ed25519:FakeKey111","access_key":{"nonce":0,"permission":{"function_call":{"allowance":"250000000000000000000000","receiver_id":"dex.near","method_names":["swap","deposit"]}}}}],"signature":"sig:fake"},"execution_outcome":{"block_hash":"blk'||h||'","block_timestamp":'||ts||',"block_height":'||h||',"id":"txc'||h||'","outcome":{"receipt_ids":["rC'||h||'"],"status":{"success_receipt_id":"rC'||h||'"},"gas_burnt":2428000000006,"tokens_burnt":"242800000000000000000","logs":[],"executor_id":"dev.near"}},"receipts":[{"execution_outcome":{"block_hash":"blk'||h||'","block_timestamp":'||ts||',"block_height":'||h||',"id":"rC'||h||'","outcome":{"receipt_ids":[],"status":{"success_value":"//5B"},"gas_burnt":2428000000005,"tokens_burnt":"242800000000000000000","logs":[],"executor_id":"contract.near"}},"receipt":{"predecessor_id":"dev.near","receiver_id":"contract.near","receipt_id":"rC'||h||'","action":{"signer_id":"dev.near","signer_public_key":"ed25519:SignerKey","input_data_ids":[],"actions":[{"kind":"DEPLOY_CONTRACT","code":"AGFzbS1mYWtlLXdhc20tY29kZQ=="},{"kind":"ADD_KEY","public_key":"ed25519:FakeKey111","access_key":{"nonce":0,"permission":{"function_call":{"allowance":"250000000000000000000000","receiver_id":"dex.near","method_names":["swap","deposit"]}}}}],"gas_price":"100000000","is_promise_yield":false}}}],"data_receipts":[]}', h
FROM heights WHERE h%3=0
UNION ALL
SELECT 'txf'||h, 'dev.near', h, 'blk'||h, ts, '{"transaction":{"hash":"txf'||h||'","signer_id":"dev.near","public_key":"ed25519:DevKey","nonce":2,"receiver_id":"missing.near","actions":[{"kind":"DELETE_ACCOUNT","beneficiary_id":"heir.near"}],"signature":"sig:fake"},"execution_outcome":{"block_hash":"blk'||h||'","block_timestamp":'||ts||',"block_height":'||h||',"id":"txf'||h||'","outcome":{"receipt_ids":["rF'||h||'"],"status":{"success_receipt_id":"rF'||h||'"},"gas_burnt":2428000000006,"tokens_burnt":"242800000000000000000","logs":[],"executor_id":"dev.near"}},"receipts":[{"execution_outcome":{"block_hash":"blk'||h||'","block_timestamp":'||ts||',"block_height":'||h||',"id":"rF'||h||'","outcome":{"receipt_ids":[],"status":{"failure":"{\"ActionError\":{\"index\":0,\"kind\":\"AccountDoesNotExist\"}}"},"gas_burnt":2428000000005,"tokens_burnt":"242800000000000000000","logs":[],"executor_id":"missing.near"}},"receipt":{"predecessor_id":"dev.near","receiver_id":"missing.near","receipt_id":"rF'||h||'","action":{"signer_id":"dev.near","signer_public_key":"ed25519:SignerKey","input_data_ids":[],"actions":[{"kind":"DELETE_ACCOUNT","beneficiary_id":"heir.near"}],"gas_price":"100000000","is_promise_yield":false}}}],"data_receipts":[]}', h
FROM heights WHERE h%3=0"""

  val p5: String =
"""WITH heights AS (SELECT range::BIGINT AS h, (1700000000000000000 + range*1000000000)::BIGINT AS ts FROM range(100, 140)), done AS (SELECT h, ts FROM heights WHERE h < 139)
SELECT a AS account_id, 'tx'||h AS transaction_hash, 'alice.near' AS signer_id,
  h AS tx_block_height, ts AS tx_block_timestamp
FROM done, (VALUES ('alice.near'),('app.near'),('bank.near'),('bob.near')) v(a)
UNION ALL
SELECT a, 'txc'||h, 'dev.near', h, ts
FROM heights, (VALUES ('dev.near'),('contract.near')) v(a) WHERE h%3=0
UNION ALL
SELECT a, 'txf'||h, 'dev.near', h, ts
FROM heights, (VALUES ('dev.near'),('missing.near')) v(a) WHERE h%3=0"""

  val p6: String =
"""WITH heights AS (SELECT range::BIGINT AS h, (1700000000000000000 + range*1000000000)::BIGINT AS ts FROM range(100, 140)), done AS (SELECT h, ts FROM heights WHERE h < 139)
SELECT r||h AS receipt_id, 'tx'||h AS transaction_hash, 'alice.near' AS signer_id,
  h AS tx_block_height, ts AS tx_block_timestamp
FROM done, (VALUES ('rA'),('rB'),('dr')) v(r)
UNION ALL
SELECT r||h, 'tx'||lower(substr(r,2,1))||h, 'dev.near', h, ts
FROM heights, (VALUES ('rC'),('rF')) v(r) WHERE h%3=0"""

  val p7: String =
"""WITH heights AS (SELECT range::BIGINT AS h, (1700000000000000000 + range*1000000000)::BIGINT AS ts FROM range(100, 140)), done AS (SELECT h, ts FROM heights WHERE h < 139)
SELECT h+d AS block_height, 'blk'||(h+d) AS block_hash,
  (1700000000000000000 + (h+d)*1000000000)::BIGINT AS block_timestamp,
  'tx'||h AS transaction_hash, 'alice.near' AS signer_id, h AS tx_block_height
FROM done, (VALUES (0),(1)) v(d)
UNION ALL
SELECT h, 'blk'||h, ts, t||h, 'dev.near', h
FROM heights, (VALUES ('txc'),('txf')) v(t) WHERE h%3=0"""

  val p8: String =
"""WITH heights AS (SELECT range::BIGINT AS h, (1700000000000000000 + range*1000000000)::BIGINT AS ts FROM range(100, 140))
SELECT h AS block_height, 'blk'||h AS block_hash, ts AS block_timestamp,
  h-1 AS prev_block_height, 'epoch'||(h//10) AS epoch_id, 1::BIGINT AS chunks_included,
  'blk'||(h-1) AS prev_block_hash, 'validator'||(h%4)||'.near' AS author_id,
  'blocksig'||h AS signature, 73::BIGINT AS protocol_version FROM heights"""

  /** Replaying duplicated input collapses to the base table under the
    * dedup view (A5 / ReplacingMergeTree) — the expected output IS p1's. */
  val p9: String = p1

  val p10: String =
"""WITH heights AS (SELECT range::BIGINT AS h, (1700000000000000000 + range*1000000000)::BIGINT AS ts FROM range(100, 140))
SELECT h+1 AS block_height, 'rB'||h AS receipt_id, a AS action_index,
  CASE WHEN a=0 THEN 'TRANSFER' ELSE 'CREATE_ACCOUNT' END AS action,
  'SUCCESS' AS status,
  CASE WHEN a=0 THEN '5000000000000000000000000' ELSE NULL END AS deposit
FROM heights, (VALUES (0::BIGINT),(1::BIGINT)) v(a)
WHERE h+1 BETWEEN 105 AND 130"""

  val p11: String =
"""WITH heights AS (SELECT range::BIGINT AS h, (1700000000000000000 + range*1000000000)::BIGINT AS ts FROM range(100, 140))
SELECT 'rB'||h AS receipt_id, 'tx'||h AS transaction_hash,
  h AS tx_block_height, h+1 AS last_block_height FROM heights WHERE h < 139"""

  /** The distributed label-propagation correlator must produce exactly
    * the sequential state machine's tables — the expected output IS p4's. */
  val p12: String = p4

}
