-- graft: materialized=merge unique_key=doc_id order_by=doc_id
-- test: unique doc_id
-- test: not_null text
select doc_id, text, lang, source, n_chars,
       cast({{ var('batch') }} as bigint) as loaded_batch
from {{ source('documents') }}
{% if is_incremental() %}
where doc_id > (select max(doc_id) from {{ this }})
{% endif %}
